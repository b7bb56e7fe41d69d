// r22 l5c phase split (guide §1): sketch (65-aggregate bit votes) vs the
// banded pair emission vs the declared summary's brute twin.
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' \
//       'runMain graft.tools.R22L5cPhase [sfDir]'
package graft.tools

import org.apache.spark.sql.functions._

object R22L5cPhase {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"  $label%-40s ${math.min(d1, d2)}%6.2f s  ($n rows)")
    }
    println(s"== l5c phases on $d (min of 2 per phase)")
    t("sketch only (64-bit votes + checkpoint)") {
      // reproduce l5cSketch's shape standalone
      val tokens = graft.core.Tables.documentsWide(s, d)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .withColumn("h", xxhash64(col("tok")))
      val bitCols = (0 until 64).map { bit =>
        sum(shiftright(col("h"), bit).bitwiseAND(1)).as(s"s$bit")
      }
      val votes = tokens.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), bitCols: _*)
      votes.select(col("doc_id"),
        (0 until 64).map { bit =>
          when(col(s"s$bit") * 2 > col("n"), shiftleft(lit(1L), bit))
            .otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
        .localCheckpoint(eager = true).count()
    }
    t("tokens + count-only agg (no bit votes)") {
      val tokens = graft.core.Tables.documentsWide(s, d)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .withColumn("h", xxhash64(col("tok")))
      tokens.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("h")).as("hs")).count()
    }
    t("full declared l5c (pairs path)") {
      graft.SparkEntry.queries("l5c_simhash")(s, d).count()
    }
    // alternating native-vs-expression sketch A/B (the r22 isolated change)
    graft.functions.SimhashVotes.register(s)
    def tokens() = graft.core.Tables.documentsWide(s, d)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    def one(body: => Long): Double = {
      val t0 = System.nanoTime(); body
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.releaseAll(s); dt
    }
    for (r <- 1 to 3) {
      val nat = one {
        tokens().groupBy(col("doc_id"))
          .agg(call_function("simhash_votes", col("h")).as("simhash"))
          .localCheckpoint(eager = true).count()
      }
      val ex = one {
        val bitCols = (0 until 64).map { bit =>
          sum(shiftright(col("h"), bit).bitwiseAND(1)).as(s"s$bit")
        }
        tokens().groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n"), bitCols: _*)
          .select(col("doc_id"),
            (0 until 64).map { bit =>
              when(col(s"s$bit") * 2 > col("n"), shiftleft(lit(1L), bit))
                .otherwise(lit(0L))
            }.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
          .localCheckpoint(eager = true).count()
      }
      println(f"  sketch A/B round $r: NATIVE $nat%5.2f EXPR $ex%5.2f")
    }
    s.stop()
  }
}
