package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the LAST 2000 characters of benchmark stdout
  * (every BENCH_r*.json `tail` is exactly 2000 chars) and parses the final
  * JSON line out of that window. Four rounds of `"parsed": null` traced to
  * one cause: the full 100+-query line is ~3 kB and can never fit. These
  * tests pin the stdout-line contract — always within budget, always valid
  * JSON, failures never trimmed away — for any future query-count growth.
  */
class BenchLineSpec extends AnyFunSuite {

  private def fakeResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q${i}%03d_some_operator_name", i * 0.037))

  test("fmt renders centisecond JSON numbers without locale or -0 artifacts") {
    assert(Bench.fmt(3.734115948) == "3.73")
    assert(Bench.fmt(0.1) == "0.1")
    assert(Bench.fmt(0.0) == "0")
    assert(Bench.fmt(-1.0) == "-1")
    assert(Bench.fmt(-0.0001) == "0")
    assert(Bench.fmt(12.0) == "12")
  }

  test("stdout line fits the driver tail budget at any query count") {
    for (n <- Seq(5, 50, 104, 250)) {
      val line = Bench.stdoutLine(fakeResults(n), "/root/testdata/sf0.1")
      assert(line.length <= 1900, s"n=$n line is ${line.length} chars")
      assert(!line.contains('\n'))
      val parsed = JsonMethods.parse(line)
      assert((parsed \ "metric") == JString("total"))
      assert((parsed \ "unit") == JString("sec"))
      assert((parsed \ "queries").isInstanceOf[JObject])
    }
  }

  test("trimming drops the cheapest queries first and keeps the slowest") {
    val results = fakeResults(250) // far over budget, forces trimming
    val line = Bench.stdoutLine(results, "/root/testdata/sf0.1")
    val kept = (JsonMethods.parse(line) \ "queries").asInstanceOf[JObject].obj.map(_._1).toSet
    assert(kept.size < results.size)
    val slowest = results.sortBy(-_._2).take(10).map(_._1)
    slowest.foreach(q => assert(kept(q), s"slowest query $q was trimmed"))
    val cheapest = results.sortBy(_._2).take(10).map(_._1)
    cheapest.foreach(q => assert(!kept(q), s"cheapest query $q survived while over budget"))
  }

  test("failed queries (-1) are never trimmed and total sums successes only") {
    val results = fakeResults(249) :+ ("q999_broken_operator" -> -1.0)
    val line = Bench.stdoutLine(results, "/root/testdata/sf0.1")
    val parsed = JsonMethods.parse(line)
    val kept = (parsed \ "queries").asInstanceOf[JObject].obj.toMap
    assert(kept("q999_broken_operator") == JInt(-1) || kept("q999_broken_operator") == JDouble(-1.0) || kept("q999_broken_operator") == JDecimal(-1))
    val JInt(nTotal) = (parsed \ "queries_total"): @unchecked
    assert(nTotal.toInt == 250)
  }

  test("total reflects ALL queries even when some are trimmed from the line") {
    val results = fakeResults(250)
    val line = Bench.stdoutLine(results, "/root/testdata/sf0.1")
    val parsed = JsonMethods.parse(line)
    val total = (parsed \ "value") match {
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case JInt(i) => i.toDouble
      case other => fail(s"unexpected total $other")
    }
    val expected = results.map(_._2).sum
    assert(math.abs(total - expected) < 0.01)
  }

  test("mass-failure round: line still fits and failed_total keeps the count") {
    // Failures alone exceed the budget here; names may be trimmed, but the
    // count must stay on the primary channel (the round-5 advice gap).
    val results = (1 to 250).map(i => (f"q${i}%03d_some_operator_name", -1.0))
    val line = Bench.stdoutLine(results, "/root/testdata/sf0.1")
    assert(line.length <= 1900)
    val parsed = JsonMethods.parse(line)
    val JInt(failed) = (parsed \ "failed_total"): @unchecked
    assert(failed.toInt == 250)
    val JInt(nTotal) = (parsed \ "queries_total"): @unchecked
    assert(nTotal.toInt == 250)
  }

  test("run-health extra fields survive trimming") {
    val extra = ""","load_avg_start":3.1,"spread_median":1.2,"noisy":true"""
    val line = Bench.stdoutLine(fakeResults(250), "/root/testdata/sf0.1", extra = extra)
    assert(line.length <= 1900)
    val parsed = JsonMethods.parse(line)
    assert((parsed \ "noisy") == JBool(true))
    assert((parsed \ "spread_median") == JDouble(1.2) || (parsed \ "spread_median") == JDecimal(1.2))
  }

  test("cleanJson renders the fresh-JVM re-measures, capped with clean_total") {
    assert(Bench.cleanJson(Seq.empty) == ""","clean":{}""")
    assert(Bench.cleanJson(Seq("l26_pagerank" -> 2.16, "bad_q" -> -1.0)) ==
      ""","clean":{"l26_pagerank":2.16,"bad_q":-1}""")
    val many = (1 to 20).map(i => f"q$i%02d" -> i.toDouble)
    val s = Bench.cleanJson(many)
    assert(s.contains(""""clean_total":20"""))
    assert(s.contains("\"q16\":16") && !s.contains("\"q17\""))
  }

  test("clean + self_adjudicated health fields survive trimming") {
    val extra = ""","noisy":true""" +
      Bench.cleanJson(Seq("a" -> 1.5, "b" -> 2.0)) + ""","self_adjudicated":true"""
    val line = Bench.stdoutLine(fakeResults(250), "/root/testdata/sf0.1", extra = extra)
    assert(line.length <= 1900)
    val parsed = JsonMethods.parse(line)
    assert((parsed \ "self_adjudicated") == JBool(true))
    assert((parsed \ "clean" \ "b") == JDouble(2.0) || (parsed \ "clean" \ "b") == JDecimal(2.0) || (parsed \ "clean" \ "b") == JInt(2))
  }

  test("spread and median helpers") {
    val spr = Bench.spreads(Map(
      "a" -> Seq(1.0, 2.0),   // 2x spread
      "b" -> Seq(0.5, 0.5),   // steady
      "c" -> Seq(-1.0, 0.3))) // failed run -> excluded
    assert(spr.keySet == Set("a", "b"))
    assert(math.abs(spr("a") - 2.0) < 1e-9)
    assert(math.abs(spr("b") - 1.0) < 1e-9)
    assert(Bench.median(Seq()) == 0.0)
    assert(Bench.median(Seq(3.0)) == 3.0)
    assert(Bench.median(Seq(1.0, 2.0, 10.0)) == 2.0)
    assert(Bench.median(Seq(1.0, 2.0, 3.0, 10.0)) == 2.5)
  }

  test("cleanSpread discards one contaminated outlier but flags persistent noise") {
    // one-off spike among three samples: the two fastest agree -> clean
    assert(math.abs(Bench.cleanSpread(Seq(1.0, 8.4, 1.1)) - 1.1) < 1e-9)
    // persistent contamination: even the two fastest disagree 2x
    assert(Bench.cleanSpread(Seq(1.0, 2.4, 2.2)) > 2.0)
    // degenerate cases: too few valid samples -> neutral 1.0
    assert(Bench.cleanSpread(Seq(1.0)) == 1.0)
    assert(Bench.cleanSpread(Seq(-1.0, 3.0)) == 1.0)
  }

  test("regate anchors: prior-times parsing and the anchor-only 3x trigger") {
    // parse exactly our own bench.json shape; drop failed (-1) anchors
    val json = """{"metric":"total","value":9.9,"unit":"sec",""" +
      """"queries":{"a_q":1.25,"b_q":-1,"c_q":0.3},"spreads":{"a_q":1.1},""" +
      """"noisy":false,"sf":"/x"}"""
    val prev = Bench.parseQueriesMap(json)
    assert(prev == Map("a_q" -> 1.25, "c_q" -> 0.3))
    // scientific notation: raw Double.toString writes 1.2E-4 — must parse
    // as the true value, not silently truncate to 1.2 (ADVICE r11)
    val sci = Bench.parseQueriesMap(
      """{"queries":{"a_q":1.2E-4,"b_q":3.5e2,"c_q":2.0}}""")
    assert(sci == Map("a_q" -> 1.2e-4, "b_q" -> 350.0, "c_q" -> 2.0), sci)
    // malformed / absent input disables regating, never crashes
    assert(Bench.parseQueriesMap("") == Map.empty)
    assert(Bench.parseQueriesMap("{\"queries\":{") == Map.empty)
    assert(Bench.parseQueriesMap("not json at all") == Map.empty)
    // ANCHOR-ONLY trigger (VERDICT r12 #2): a >=3x regression vs the prior
    // recorded time fires the regate regardless of instantaneous load —
    // the signature takes NO load argument, so the decision is
    // load-independent by construction (r12's phantom was measured during
    // a load transient the old `load > limit` precondition missed).
    assert(Bench.needsRegate(4.0, Some(1.0)),
      "a 4x outlier vs its anchor is always regated, loaded box or not")
    assert(!Bench.needsRegate(2.9, Some(1.0)),
      "under 3x is normal jitter — no regate")
    assert(!Bench.needsRegate(4.0, None),
      "no anchor (new query) -> nothing to adjudicate")
    assert(!Bench.needsRegate(-1.0, Some(1.0)),
      "a failed query is a failure, not a regate candidate")
    // the extra sample can only LOWER the min — a kept sample extends the
    // vector (min over a superset is <=), a failed one changes nothing,
    // so regating can unmask a phantom but never hide a real regression
    val base = Vector(4.0, 4.2)
    assert(Bench.withExtraSample(base, 0.9) == Vector(4.0, 4.2, 0.9))
    assert(Bench.withExtraSample(base, 0.9).min < base.min)
    assert(Bench.withExtraSample(base, 6.0).min == base.min,
      "a slower extra sample leaves the reported min unchanged")
    assert(Bench.withExtraSample(base, -1.0) == base,
      "a failed extra sample is dropped, never flips clean runs to -1")
  }

  test("anchor file present + 5x outlier => query is a regate candidate; " +
       "missing file => anchors empty, distinguishable via the anchors field") {
    // End-to-end over the file path main() uses: a prior artifact on disk
    // anchors the fresh run; a 5x outlier against it must trip needsRegate
    // (VERDICT r13 #2's ask — BENCH_r13 shipped a 5.1x phantom with
    // regated:[] because the anchor path silently resolved to nothing).
    val dir = java.nio.file.Files.createTempDirectory("bench-anchor-spec")
    try {
      val prevArtifact = dir.resolve("bench.json")
      java.nio.file.Files.writeString(prevArtifact,
        """{"metric":"total","value":2.0,"unit":"sec",""" +
        """"queries":{"l32_mad_outliers":0.77,"l26_pagerank":1.8},"sf":"/x"}""" + "\n")
      val anchors = Bench.loadAnchors(prevArtifact.toString)
      assert(anchors.size == 2, "artifact parses to 2 anchors")
      // the 5.1x phantom shape from BENCH_r13: fresh min 3.92 vs anchor 0.77
      assert(Bench.needsRegate(3.92, anchors.get("l32_mad_outliers")),
        "a 5x outlier with an anchor present MUST be regated")
      assert(!Bench.needsRegate(1.9, anchors.get("l26_pagerank")),
        "a within-jitter time is not regated")
      // missing anchor file: regating disabled but OBSERVABLE — loadAnchors
      // returns empty and main() records `anchors:0` in the artifact, so
      // "no regate because no anchor" is distinguishable from "no regression"
      assert(Bench.loadAnchors(dir.resolve("nope.json").toString) == Map.empty)
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("anchorSuspects names every >=2x anchor mover on a loaded run, " +
       "none on an idle one") {
    // VERDICT r14 #4: r14's t14/t15/t16/l40 were 2.2-2.9x anchor movers
    // under load_avg_max 15.76 — below the 3x regate trigger, so they
    // shipped as apparent regressions only a judge idle rerun disproved.
    val anchors = Map("t14_q" -> 1.3, "t15_q" -> 1.0, "l40_q" -> 3.9,
      "flat_q" -> 2.0, "tiny_q" -> 0.1)
    val mins = Map(
      "t14_q" -> 2.77,  // 2.13x  -> suspect
      "t15_q" -> 2.14,  // 2.14x  -> suspect
      "l40_q" -> 8.47,  // 2.17x  -> suspect
      "flat_q" -> 2.1,  // 1.05x  -> clean
      "tiny_q" -> 0.3,  // 3x but under the 0.5s floor -> jitter, not suspect
      "new_q" -> 5.0)   // no anchor -> nothing to compare
    val gateLimit = 4.0
    assert(Bench.anchorSuspects(mins, anchors, loadMax = 15.76, gateLimit)
      == Seq("l40_q", "t14_q", "t15_q"))
    // idle box (peak load under the gate limit): a 2x mover there is a
    // REAL regression and must read as one, not be discounted as noise
    assert(Bench.anchorSuspects(mins, anchors, loadMax = 1.2, gateLimit)
      == Seq.empty)
    // no anchors at all (first round): nothing to flag
    assert(Bench.anchorSuspects(mins, Map.empty, loadMax = 15.76, gateLimit)
      == Seq.empty)
  }

  test("needsCleanRefork: >2x own-method anchor disagreement, failures and missing anchors exempt") {
    // the VERDICT r19 #1 cross-check: a clean fork >2x its fresh-JVM
    // anchor earns ONE re-fork; a fork at/below 2x, a failed fork, or a
    // query without an anchor never does
    assert(Bench.needsCleanRefork(8.28, Some(0.57)))   // r19's e10 shape
    assert(!Bench.needsCleanRefork(0.9, Some(0.5)))    // < 2x: plausible
    assert(!Bench.needsCleanRefork(1.0, Some(0.5)))    // exactly 2x: not >
    assert(!Bench.needsCleanRefork(-1.0, Some(0.57)))  // failed fork
    assert(!Bench.needsCleanRefork(8.28, None))        // no anchor
  }

  test("loadFreshAnchors parses the bench_anchors.json entry shape, tolerant to junk") {
    val f = java.nio.file.Files.createTempFile("anchors", ".json")
    java.nio.file.Files.writeString(f,
      """{"dir":"/x","fresh_jvm_per_query":true,"load_avg_start":0.11,""" +
      """"queries":{"l35_triangles":{"t":3.89,"rows":1},""" +
      """"l40_label_prop":{"t":3.16,"rows":20000},""" +
      """"bad_cell":{"t":-1,"rows":-1,"err":"X"}}}""")
    val m = Bench.loadFreshAnchors(f.toString)
    assert(m == Map("l35_triangles" -> 3.89, "l40_label_prop" -> 3.16),
      m.toString) // failed (-1) cells can't anchor
    assert(Bench.loadFreshAnchors("/nonexistent/anchors.json") == Map.empty)
    java.nio.file.Files.delete(f)
  }

  test("clean_reforked / clean_skipped_loaded health fields survive trimming") {
    val many = (1 to 300).map(i => (f"q$i%03d", i * 0.01))
    val extra = ""","clean":{"e10_event_paths":0.57},"clean_reforked":["e10_event_paths"]""" +
      ""","clean_skipped_loaded":["l6b_embed_dedup"],"fresh_anchors":41,"self_adjudicated":false"""
    val line = Bench.stdoutLine(many, "/root/testdata/sf0.1", extra = extra)
    assert(line.length <= 1900)
    assert(line.contains(""""clean_reforked":["e10_event_paths"]"""))
    assert(line.contains(""""clean_skipped_loaded":["l6b_embed_dedup"]"""))
    assert(line.contains(""""self_adjudicated":false"""))
  }

  test("forkClean end-to-end: the --one child protocol returns a time; timeout kills the child") {
    // the clean re-measure pass only executes on a suspect-bearing run, so
    // without this pin a broken child protocol (classpath, CLEAN-line
    // format, parse regex) would surface ONLY in the next noisy bench —
    // exactly when the adjudication machinery is needed. ~25 s: one real
    // fresh-JVM cell at sf0.001.
    val t = Bench.forkClean("p6_distinct", "/root/testdata/sf0.001",
      timeoutMs = 180000L)
    assert(t > 0, s"child CLEAN protocol returned $t")
    // enforcement, not accounting (ADVICE r19): a budget far smaller than
    // JVM startup must force-kill the child and read as a failure fast
    val t0 = System.nanoTime()
    val killed = Bench.forkClean("p6_distinct", "/root/testdata/sf0.001",
      timeoutMs = 500L)
    val wall = (System.nanoTime() - t0) / 1e9
    assert(killed == -1.0, s"timed-out child returned $killed, not -1")
    assert(wall < 30.0, s"timeout path took $wall s — waitFor bound not enforced")
  }

  test("real round-4 shape (104 queries) keeps the heavy hitters on stdout") {
    // Mirror of the r4 distribution: most queries 0.1-0.5s, a heavy tail.
    val base = (1 to 96).map(i => (f"op${i}%03d_family_query_name", 0.1 + (i % 5) * 0.1))
    val heavy = Seq("o3_topk_global" -> 6.1, "l5c_simhash" -> 3.73,
      "l5b_minhash_lsh" -> 2.7, "t9_stream_stream_join" -> 2.1,
      "t1_tumbling_window" -> 1.99, "l5_jaccard_pairs" -> 1.84,
      "l5e_dedup_groups" -> 1.75, "l7d_knn_pq" -> 1.71)
    val line = Bench.stdoutLine(base ++ heavy, "/root/testdata/sf0.1")
    assert(line.length <= 1900)
    val kept = (JsonMethods.parse(line) \ "queries").asInstanceOf[JObject].obj.map(_._1).toSet
    heavy.foreach { case (q, _) => assert(kept(q), s"heavy query $q missing from stdout line") }
  }
}
