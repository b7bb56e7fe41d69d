package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables, TempDirs}
import scala.jdk.CollectionConverters._

/** Data-LAYOUT operators — the write-side levers that decide how much a
  * 100 TB table costs to READ. Correctness never depends on layout (the
  * declared queries hash-match the oracle on the same rows either way);
  * what layout buys is pruning: which parquet files a selective scan can
  * skip from footer min/max stats alone. LayoutSpec asserts the skipping
  * itself; the driver's oracle asserts the rows.
  *
  * Reference scope: CelebiProjects/Yuki materializes every step result as
  * files between steps (kernel/VWorkflow.py step outputs) but has no
  * layout control at all — at its scales none was needed. At ours, layout
  * IS an operator.
  */
object Layout {
  import Relational.Q

  private def partFiles(dir: String): Seq[java.nio.file.Path] = {
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try walk.iterator().asScala
      .filter { f =>
        val n = f.getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }.toList
    finally walk.close()
  }

  /** min-max grid of `c` onto [0, 65535] — the 16-bit coordinate
    * z_interleave expects. Bounds ride as literals (driver-scale agg). */
  private def gridded(c: Column, lo: Long, hi: Long): Column =
    (((c - lit(lo)).cast("double") / math.max(1L, hi - lo)) * 65535).cast("int")

  /** A ~10% selective band of a column's observed range, floor/ceil-snapped
    * so it always contains integers even on a 10-value fixture domain
    * (sf0.001's l_suppkey is 0..9 — an un-snapped fractional band matches
    * nothing there). Placed at 26–36% of the range: inside one z-quadrant
    * on both dims, so the band exercises z-locality rather than straddling
    * the top Morton bit. Mirrored exactly in the oracle SQL
    * (`floor(omin + 0.26e0*(omax-omin))` — e-notation keeps DuckDB in
    * double arithmetic, matching the driver-side Scala doubles bit for
    * bit). */
  private[graft] def band(lo: Long, hi: Long): (Double, Double) =
    (math.floor(lo + 0.26 * (hi - lo)), math.ceil(lo + 0.36 * (hi - lo)))

  /** Write `lineitem` z-ordered on (l_orderkey, l_suppkey) into a scratch
    * dir: grid both columns to 16 bits, Morton-interleave
    * ([[graft.functions.ZInterleave]]), range-partition into `files`
    * z-ranges and sort within each — every file covers a compact 2-D
    * region, so footer stats prune on EITHER column. Returns (dir, stats
    * row) for the query and the pruning spec. */
  private[graft] def writeZordered(s: SparkSession, d: String,
      files: Int = 16): (String, (Long, Long, Long, Long)) = {
    graft.functions.ZOrder.register(s)
    val li = Tables.lineitem(s, d)
    val r = li.agg(min(col("l_orderkey")), max(col("l_orderkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val bounds = (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
      r.getAs[Number](2).longValue, r.getAs[Number](3).longValue)
    val (oMin, oMax, sMin, sMax) = bounds
    val out = TempDirs.scratchSlot("zorder").toString
    li.withColumn("zkey", call_function("z_interleave",
        gridded(col("l_orderkey"), oMin, oMax),
        gridded(col("l_suppkey"), sMin, sMax)))
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
      .write.mode("overwrite").parquet(out)
    (out, bounds)
  }

  /** S9: Z-ORDER layout roundtrip — write z-ordered, read back through a
    * 2-D selective filter (a ~10% band of BOTH dimensions). The
    * driver hash-checks the band's rows against the oracle on the raw
    * table: layout must never change results. The pruning claim itself —
    * a one-dimensional band touches a strict subset of files on either
    * axis — is asserted in LayoutSpec, where skipped files are countable. */
  val s9ZorderLayout: Q = (s, d) => {
    val (out, (oMin, oMax, sMin, sMax)) = writeZordered(s, d)
    val (oLo, oHi) = band(oMin, oMax)
    val (sLo, sHi) = band(sMin, sMax)
    // bounds are integral (floor/ceil) — compare as LONG, not double: a
    // double literal makes Spark cast the bigint column and a cast column
    // cannot reach PushedFilters, which silently turns footer-stat file
    // pruning into a full scan (LayoutSpec asserts the pushdown)
    s.read.parquet(out)
      .where(col("l_orderkey") >= oLo.toLong && col("l_orderkey") <= oHi.toLong &&
        col("l_suppkey") >= sLo.toLong && col("l_suppkey") <= sHi.toLong)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"))
  }

  /** Target bytes per compacted file. Production sizes this to the scan
    * unit (~128 MiB); the fixture constant is small enough that the op is
    * exercised for real (bytes → file count → repartition) at test scale. */
  private[graft] val compactTargetBytes: Long = 8L << 20

  /** Compact a parquet dir to ceil(bytes / target) files. The repartition
    * is a full shuffle of the data being compacted — exactly what a
    * production OPTIMIZE does, parallel in and parallel out; never a
    * coalesce(1)-style driver funnel. Returns the output dir. */
  private[graft] def compact(s: SparkSession, inDir: String): String = {
    val bytes = partFiles(inDir).map(java.nio.file.Files.size).sum
    val nOut = math.max(1L, (bytes + compactTargetBytes - 1) / compactTargetBytes).toInt
    val out = TempDirs.scratchSlot("compact").toString
    s.read.parquet(inDir).repartition(nOut)
      .write.mode("overwrite").parquet(out)
    out
  }

  /** S10: small-file COMPACTION roundtrip — fragment `documents` into 64
    * shards (the streaming-ingest debris pattern: every micro-batch leaves
    * a file per partition), compact to the byte-target file count, and
    * aggregate the readback. The driver hash-checks the aggregate against
    * the raw table (compaction must lose nothing); LayoutSpec asserts the
    * file counts actually collapsed. */
  val s10Compaction: Q = (s, d) => {
    val frag = TempDirs.scratchSlot("frag").toString
    Tables.documents(s, d).repartition(64)
      .write.mode("overwrite").parquet(frag)
    val out = compact(s, frag)
    s.read.parquet(out)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"))
  }

  val queries: Map[String, Q] = Map(
    "s9_zorder_layout" -> s9ZorderLayout,
    "s10_compaction" -> s10Compaction
  )

  val oracle: Map[String, String] = Map(
    "s9_zorder_layout" ->
      """WITH b AS (SELECT min(l_orderkey) AS omin, max(l_orderkey) AS omax,
                           min(l_suppkey) AS smin, max(l_suppkey) AS smax
                    FROM lineitem)
         SELECT l_orderkey, l_suppkey, l_linenumber, l_quantity
         FROM lineitem, b
         WHERE l_orderkey >= floor(omin + 0.26e0 * (omax - omin))
           AND l_orderkey <= ceil(omin + 0.36e0 * (omax - omin))
           AND l_suppkey >= floor(smin + 0.26e0 * (smax - smin))
           AND l_suppkey <= ceil(smin + 0.36e0 * (smax - smin))""",
    "s10_compaction" ->
      """SELECT source, count(*) AS n_docs,
                CAST(sum(length(text)) AS BIGINT) AS total_chars
         FROM documents GROUP BY source"""
  )
}
