// r21 l5c phase attribution + variant A/B (guide §1): where do l5c's
// ~4 s at sf0.1 go — the sketch build (tokenize + 64 bit-vote agg), the
// band self-join, or the 5M-row pair emission — and does replacing the
// (band_idx, band) SELF-JOIN with one grouped aggregation + map-side
// pair generation (the basketPairs shape that won for the co-purchase
// graph, guide §2.4 "remove shuffles outright") beat the join?
//   tools/run.sh graft.tools.R21L5cProbe [dir...]
package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

object R21L5cProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val s = graft.core.Sessions.local()
    s.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(s)
    def t(label: String)(body: => Long): Unit = {
      def one(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.releaseAll(s)
        (dt, n)
      }
      val (d1, n) = one(); val (d2, _) = one()
      println(f"  $label%-44s ${math.min(d1, d2)}%8.2f s  ($n rows)")
    }
    // inline twin of TextOps.l5cSketch (private there)
    def sketch(d: String): DataFrame = {
      val tokens = graft.core.Tables.documentsWide(s, d)
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        .withColumn("h", xxhash64(col("tok")))
      val bitCols = (0 until 64).map { bit =>
        sum(shiftright(col("h"), bit).bitwiseAND(1)).as(s"s$bit")
      }
      tokens.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), bitCols: _*)
        .select(col("doc_id"),
          (0 until 64).map { bit =>
            when(col(s"s$bit") * 2 > col("n"), shiftleft(lit(1L), bit)).otherwise(lit(0L))
          }.reduce((a: Column, b: Column) => a.bitwiseOR(b)).as("simhash"))
        .localCheckpoint(eager = true)
    }
    def chunk(i: Int): Column = shiftright(col("simhash"), i * 8).bitwiseAND(0xff)
    val chunkPairs = for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j)
    def banded(sim: DataFrame): DataFrame = sim.select(
      col("doc_id"), col("simhash"),
      posexplode(array(chunkPairs.map { case (i, j) =>
        shiftleft(chunk(i), 8).bitwiseOR(chunk(j))
      }: _*)).as(Seq("band_idx", "band")))
    def firstCleanIdx(x: Column): Column = {
      def byteClean(i: Int): Column = shiftright(x, i * 8).bitwiseAND(0xff) === 0
      chunkPairs.zipWithIndex.foldRight(lit(-1): Column) {
        case (((i, j), idx), acc) =>
          when(byteClean(i) && byteClean(j), lit(idx)).otherwise(acc)
      }
    }
    // VARIANT: bucket-grouped map-side pair emission — ONE exchange on
    // (band_idx, band), pairs generated from the sorted in-bucket array
    // (i < j ⟹ da < db), same hamming + first-clean-index filters.
    def arrayPairs(sim: DataFrame): DataFrame = {
      val buckets = banded(sim)
        .groupBy(col("band_idx"), col("band"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("ds"))
        .where(size(col("ds")) >= 2)
      val x = col("ha").bitwiseXOR(col("hb"))
      buckets
        .select(col("band_idx"), posexplode(col("ds")).as(Seq("i", "a")), col("ds"))
        .select(col("band_idx"), col("a.doc_id").as("da"), col("a.simhash").as("ha"),
          explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
        .select(col("band_idx"), col("da"), col("ha"),
          col("b.doc_id").as("db"), col("b.simhash").as("hb"))
        .withColumn("hamming", bit_count(x))
        .where(col("hamming") <= 6 && col("band_idx") === firstCleanIdx(x))
        .select(col("da"), col("db"), col("hamming"))
    }
    dirs.foreach { d =>
      println(s"== $d")
      t("sketch only (ckpt + count)")(sketch(d).count())
      t("full l5c CURRENT (join emission)")(
        graft.ops.TextOps.l5cSimhash(s, d).count())
      t("full l5c VARIANT (bucket-array emission)") {
        arrayPairs(sketch(d)).count()
      }
      // parity: identical pair sets (da, db, hamming)
      t("parity: variant EXCEPT current (want 0)") {
        val cur = graft.ops.TextOps.l5cSimhash(s, d)
        arrayPairs(sketch(d)).exceptAll(cur).count()
      }
      t("parity: current EXCEPT variant (want 0)") {
        val cur = graft.ops.TextOps.l5cSimhash(s, d)
        cur.exceptAll(arrayPairs(sketch(d))).count()
      }
    }
    s.stop()
  }
}
