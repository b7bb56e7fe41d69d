package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** The layout operators' REASON to exist is unobservable from result rows
  * (the oracle proves rows are unchanged): z-ordering exists to let file
  * stats prune 2-D selective scans, compaction exists to collapse
  * small-file debris. This spec asserts those effects directly. */
class LayoutSpec extends SparkSpec {

  test("z_interleave: golden Morton codes and bit interleaving property") {
    graft.functions.ZOrder.register(spark)
    def z(a: Int, b: Int): Long =
      spark.range(1).select(call_function("z_interleave", lit(a), lit(b)))
        .head().getLong(0)
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)
    assert(z(0, 1) == 2L)
    assert(z(3, 0) == 5L)
    assert(z(0, 3) == 10L)
    assert(z(0xFFFF, 0) == 0x55555555L)
    assert(z(0, 0xFFFF) == 0xAAAAAAAAL)
    assert(z(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
    // reference interleave vs the shift-or-mask ladder, random coords
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val (a, b) = (rnd.nextInt(65536), rnd.nextInt(65536))
      val expected = (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
      assert(z(a, b) == expected, s"z($a, $b)")
    }
    // null propagation
    val nullRow = spark.range(1)
      .select(call_function("z_interleave", lit(null).cast("int"), lit(1)))
      .head()
    assert(nullRow.isNullAt(0))
  }

  test("s9 z-order layout: a band on EITHER dimension touches a strict subset of files") {
    // sf0.01: dense enough key domains (15k orderkeys, 100 suppkeys) that
    // row locality is measurable; sf0.001's 10-value suppkey domain grids
    // onto too few distinct Morton coordinates to exercise the curve
    val dir001 = "/root/testdata/sf0.01"
    val (dir, (oMin, oMax, sMin, sMax)) = Layout.writeZordered(spark, dir001)
    val all = spark.read.parquet(dir)
    val total = all.select(input_file_name()).distinct().count()
    assert(total >= 8, s"z-order write produced only $total files — pruning untestable")
    def touched(pred: org.apache.spark.sql.Column): Long =
      all.where(pred).select(input_file_name()).distinct().count()
    val (oLo, oHi) = Layout.band(oMin, oMax)
    val (sLo, sHi) = Layout.band(sMin, sMax)
    val oBand = col("l_orderkey") >= oLo && col("l_orderkey") <= oHi
    val sBand = col("l_suppkey") >= sLo && col("l_suppkey") <= sHi
    val tO = touched(oBand)
    val tS = touched(sBand)
    info(s"files: total=$total, orderkey-band=$tO, suppkey-band=$tS")
    // the whole point of z-order vs a single-column sort: BOTH dimensions
    // localize. A 10% band should sit in a fraction of the z-ranges; a
    // single-column sort would leave the NON-leading band spread across
    // every file (touched == total).
    assert(tO > 0 && tO <= total / 2,
      s"orderkey band touched $tO/$total files — no z-locality on dim 1")
    assert(tS > 0 && tS <= total / 2,
      s"suppkey band touched $tS/$total files — no z-locality on dim 2")
  }

  test("s9 query: band predicates reach PushedFilters (footer-stat pruning is live)") {
    // a double literal against the bigint column would wrap it in a cast
    // and silently demote the scan to IsNotNull-only pushdown — exactly
    // the regression this pins (found via PLANS.md inspection)
    val df = graft.ops.Layout.s9ZorderLayout(spark, sfDir)
    // formatted explain prints PushedFilters untruncated (simple .toString
    // elides long filter lists with "...")
    val scan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = scan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    for (c <- Seq("l_orderkey", "l_suppkey")) {
      assert(pushed.contains(s"GreaterThanOrEqual($c"), s"no >= pushdown for $c: $pushed")
      assert(pushed.contains(s"LessThanOrEqual($c"), s"no <= pushdown for $c: $pushed")
    }
  }

  test("s10 compaction: 64 fragment files collapse to the byte-target count, losslessly") {
    val frag = graft.core.TempDirs.scratch("frag_spec").toString
    val docs = graft.core.Tables.documents(spark, sfDir)
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    def files(dir: String): Long =
      spark.read.parquet(dir).select(input_file_name()).distinct().count()
    val nFrag = files(frag)
    assert(nFrag == 64, s"fragmentation setup wrote $nFrag files")
    val out = Layout.compact(spark, frag)
    val nOut = files(out)
    // fixture bytes are far under one 8 MiB target -> exactly one file;
    // the formula (not the constant) is what production retunes
    assert(nOut < nFrag, s"compaction did not reduce files: $nFrag -> $nOut")
    assert(nOut == 1, s"fixture fits one target file, got $nOut")
    // lossless: same multiset of doc ids
    val before = docs.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val after = spark.read.parquet(out).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    assert(after.sameElements(before), "compaction changed table contents")
  }
}
