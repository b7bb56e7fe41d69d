package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{EventOps, Relational, TextOps}

/** Contracts for the incremental-maintenance / split family:
  * s17 (mergeable-partial MV refresh), l38 (leakage-safe group split),
  * e11 (conversion-lag histogram) — each pinned against an independent
  * recomputation that shares no plan with the declared query. */
class IncrementalSpec extends SparkSpec {

  private def sortedRows(df: DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("s17 incremental refresh lands exactly on the from-scratch aggregate") {
    val o = Tables.orders(spark, sfDir)
      .withColumn("month_us", unix_micros(date_trunc("month", col("o_orderdate"))))
      .withColumn("cents", Relational.cents(col("o_totalprice")))
    val full = o.groupBy(col("o_orderstatus"), col("month_us"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
    assert(sortedRows(Relational.s17IncrementalAgg(spark, sfDir)) == sortedRows(full))
  }

  test("s17 partial merge is split-independent: a 3-way split reaches the same result") {
    // the declared query splits history/delta by month parity; merging the
    // SAME mergeable partials from a month%3 three-way split must land on
    // the identical rows — associativity of (count, cents-long) merge
    val o = Tables.orders(spark, sfDir)
      .withColumn("month_us", unix_micros(date_trunc("month", col("o_orderdate"))))
      .withColumn("cents", Relational.cents(col("o_totalprice")))
    def partials(df: DataFrame) =
      df.groupBy(col("o_orderstatus"), col("month_us"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
    val threeWay = (0 to 2).map(i =>
        partials(o.where(month(col("o_orderdate")) % 3 === i)))
      .reduce(_ unionByName _)
      .groupBy(col("o_orderstatus"), col("month_us"))
      .agg(sum(col("n_orders")).as("n_orders"), sum(col("cents")).as("cents"))
    assert(sortedRows(Relational.s17IncrementalAgg(spark, sfDir)) == sortedRows(threeWay))
  }

  test("l38 split is group-atomic, total, and uses all three folds") {
    val rows = TextOps.l38GroupSplit(spark, sfDir)
      .select(col("doc_id"), col("component"), col("split")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == nDocs, "split must be total over documents")
    assert(rows.map(_._1).distinct.length == rows.length, "one fold per doc")
    // group-atomicity: no component straddles folds
    val perGroup = rows.groupBy(_._2).map { case (_, ms) => ms.map(_._3).distinct.length }
    assert(perGroup.forall(_ == 1), "a dedup group straddles folds")
    // fold = pure function of component id, exactly the declared 80/10/10 cut
    rows.foreach { case (_, comp, split) =>
      val want = if (comp % 100 < 80) "train" else if (comp % 100 < 90) "val" else "test"
      assert(split == want, s"component $comp -> $split, want $want")
    }
    assert(rows.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"),
      "fixture should populate all three folds")
  }

  test("p9 expectations: clean fixture passes all five; injected violations count exactly") {
    val clean = Relational.p9Expectations(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(clean.size == 5)
    assert(clean.values.forall { case (n, p) => n == 0L && p }, clean.toString)

    // corrupt a copy: 3 duplicated keys, 2 non-positive prices, 1 bad
    // status, 4 orphan custkeys — each lands in exactly one counter
    val o = Tables.orders(spark, sfDir)
    val dups = o.orderBy(col("o_orderkey")).limit(3)
    val badPrice = o.orderBy(col("o_orderkey")).limit(2)
      .withColumn("o_totalprice", lit(-5.0))
      .withColumn("o_orderkey", col("o_orderkey") + lit(900000000L))
    val badStatus = o.orderBy(col("o_orderkey")).limit(1)
      .withColumn("o_orderstatus", lit("X"))
      .withColumn("o_orderkey", col("o_orderkey") + lit(910000000L))
    val orphan = o.orderBy(col("o_orderkey")).limit(4)
      .withColumn("o_custkey", col("o_custkey") + lit(920000000L))
      .withColumn("o_orderkey", col("o_orderkey") + lit(930000000L))
    val corrupted = o.unionByName(dups).unionByName(badPrice)
      .unionByName(badStatus).unionByName(orphan)
    val got = Relational.expectationsFrames(corrupted, Tables.customer(spark, sfDir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("unique:o_orderkey") == 3L, got.toString)
    assert(got("range:o_totalprice>0") == 2L, got.toString)
    assert(got("accepted:o_orderstatus") == 1L, got.toString)
    assert(got("fk:o_custkey->customer") == 4L, got.toString)
    assert(got("not_null:o_orderkey") == 0L, got.toString)
  }

  test("l40 label propagation matches a driver-side synchronous recomputation") {
    val got = graft.ops.Graphs.l40LabelProp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent brute force: same graph, same 3 synchronous rounds,
    // same (count desc, label asc) tie-break
    val pl = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pl.toSeq.groupBy(_._1).values.toSeq.flatMap { grp =>
      val parts = grp.map(_._2).distinct
      for (a <- parts; b <- parts if a < b) yield (a, b)
    }.toSet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var labels = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = nbrs.map { case (node, ns) =>
        val counts = ns.map(labels).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        node -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got == labels, s"${got.size} got vs ${labels.size} want")
    // communities must actually coalesce: fewer labels than nodes
    assert(got.values.toSet.size < got.size)
  }

  test("l42 sequence packing: interior sequences are exactly full; segments tile every doc") {
    val rows = TextOps.queries("l42_seq_pack")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // every interior (source, seq_no) sums to exactly L; only the last
    // sequence of a source may be ragged
    val bySeq = rows.groupBy(r => (r._2, r._3))
      .map { case (k, segs) => k -> segs.map(_._5).sum }
    val lastSeq = bySeq.keys.groupBy(_._1).map { case (src, ks) => src -> ks.map(_._2).max }
    bySeq.foreach { case ((src, seq), total) =>
      if (seq < lastSeq(src)) assert(total == 512L, s"($src, $seq) sums to $total")
      else assert(total <= 512L, s"($src, $seq) overflows: $total")
    }
    // segments tile each doc contiguously from 0 to n_tokens
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (docId, segs) =>
      val sorted = segs.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"doc $docId first segment offset")
      assert(sorted.map(_._5).sum == docs(docId), s"doc $docId segment total")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4, s"doc $docId gap at ${b._4}")
        case _ => ()
      }
    }
  }

  test("l42 packing law on adversarial lengths: exact-L docs, 1-token docs, straddlers") {
    import spark.implicits._
    val L = 7L
    // token counts hitting every boundary case: exactly L, L±1, 1, 2L,
    // 2L+1, and a long straddler
    val lens = Seq(7, 1, 8, 6, 14, 15, 1, 7, 23, 2)
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, if (i % 2 == 0) "sA" else "sB", Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val rows = TextOps.seqPackFrames(docs, L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // tiling per doc
    val nTokens = lens.zipWithIndex.map { case (n, i) => i.toLong -> n.toLong }.toMap
    rows.groupBy(_._1).foreach { case (id, segs) =>
      val sorted = segs.sortBy(_._4)
      assert(sorted.head._4 == 0L && sorted.map(_._5).sum == nTokens(id), s"doc $id")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4, s"doc $id")
        case _ => ()
      }
    }
    // interior sequences exactly L, per source
    val bySeq = rows.groupBy(r => (r._2, r._3)).map { case (k, v) => k -> v.map(_._5).sum }
    val last = bySeq.keys.groupBy(_._1).map { case (s0, ks) => s0 -> ks.map(_._2).max }
    bySeq.foreach { case ((s0, q), tot) =>
      if (q < last(s0)) assert(tot == L, s"($s0,$q)=$tot") else assert(tot <= L)
    }
    // sequence numbering is dense from 0 per source
    rows.groupBy(_._2).foreach { case (s0, rs) =>
      val seqs = rs.map(_._3).distinct.sorted
      assert(seqs.head == 0L && seqs.last == seqs.length - 1L, s"$s0: $seqs")
    }
  }

  test("l41 DSIR: self-target weights are exactly zero; holdout target discriminates") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // target == source -> every gram's smoothed probabilities are the
    // SAME double on both sides, so each term and the sum are exactly 0.0
    val self = TextOps.dsirFrames(docs, docs).collect()
    assert(self.nonEmpty)
    assert(self.forall(_.getDouble(2) == 0.0),
      self.filter(_.getDouble(2) != 0.0).take(3).mkString(","))
    // the declared pseudo-holdout query must actually discriminate
    val declared = TextOps.l41DsirWeights(spark, sfDir).collect()
    assert(declared.exists(_.getDouble(2) != 0.0))
    assert(declared.length == docs.where(col("doc_id") % 20 =!= 0).count().toInt)
  }

  test("e11 conversion lag matches a driver-side brute-force recomputation") {
    val got = EventOps.e11ConversionLag(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val want = byUser.toSeq.flatMap { case (_, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val v0 = views.min
        val buys = es.filter(e => e._2 == "purchase" && e._3 >= v0).map(_._3)
        if (buys.isEmpty) None
        else Some(math.min((buys.min - v0) / 3600000000L, 48L))
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want, s"got=$got want=$want")
    assert(got.nonEmpty && got.keys.forall(k => k >= 0 && k <= 48))
  }
}
