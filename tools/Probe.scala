// Scratch instrumentation main — run via:
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' 'runMain graft.tools.Probe'
package graft.tools

object Probe {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.local()
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(work: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = work
      System.err.println(f"$tag%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }
    // stages of l5c, cumulative
    import org.apache.spark.sql.functions._
    val toks = (c: org.apache.spark.sql.Column) => split(c, " ")
    val tokens = graft.core.Tables.documentsWide(s, d)
      .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    time("tokens")(tokens.count())
    val bitCols = (0 until 64).map { bit =>
      sum(shiftright(col("h"), bit).bitwiseAND(1)).as(s"s$bit") }
    val votes = tokens.groupBy(col("doc_id")).agg(count(lit(1)).as("n"), bitCols: _*)
    time("votes")(votes.count())
    val sim = votes.select(col("doc_id"),
      (0 until 64).map { bit =>
        when(col(s"s$bit") * 2 > col("n"), shiftleft(lit(1L), bit)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b)).as("simhash")).localCheckpoint(true)
    time("sim ckpt")(sim.count())
    def chunk(i: Int) = shiftright(col("simhash"), i * 8).bitwiseAND(0xff)
    val chunkPairs = for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j)
    val banded = sim.select(col("doc_id"), col("simhash"),
      posexplode(array(chunkPairs.map { case (i, j) =>
        shiftleft(chunk(i), 8).bitwiseOR(chunk(j)) }: _*)).as(Seq("band_idx", "band")))
    time("banded")(banded.count())
    val joined = banded.select(col("band_idx"), col("band"), col("doc_id").as("da"), col("simhash").as("ha"))
      .join(banded.select(col("band_idx"), col("band"), col("doc_id").as("db"), col("simhash").as("hb")),
        Seq("band_idx", "band"))
      .where(col("da") < col("db"))
    time("joined pairs")(joined.count())
    time("hamming filtered")(joined.withColumn("hamming",
      bit_count(col("ha").bitwiseXOR(col("hb")))).where(col("hamming") <= 6).count())
    s.stop()
  }
}
