package graft

import org.apache.spark.sql.functions._
import graft.functions.FreqSketch

/** Contracts of the Misra-Gries heavy-hitters aggregate (G13): exactness
  * below capacity, the containment + bounded-undercount guarantee above
  * it, and guarantee stability under different partitionings (the
  * mergeable-summaries property the shuffle relies on). */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    FreqSketch.register(spark)
    items.toDF("w").repartition(parts)
      .agg(expr(s"freq_sketch(w, $k)").as("mp"))
      .head().getMap[String, Long](0).toMap
  }

  test("exact counts while the vocabulary fits the k counters") {
    val items = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val got = sketchOf(scala.util.Random.shuffle(items), k = 8, parts = 3)
    assert(got == Map("a" -> 7L, "b" -> 3L, "c" -> 2L))
  }

  test("heavy hitters survive with bounded undercount, at any partitioning") {
    // one item at 40%, a long tail of singletons: n = 500, k = 8 →
    // anything over n/9 ≈ 56 must be present with count ≥ true − n/9
    val n = 500
    val heavyCount = 200
    val items = Seq.fill(heavyCount)("HEAVY") ++
      (0 until (n - heavyCount)).map(i => s"noise$i")
    for (parts <- Seq(1, 7, 32)) {
      val got = sketchOf(scala.util.Random.shuffle(items), k = 8, parts = parts)
      assert(got.size <= 8, s"MG must keep <= k counters, got ${got.size}")
      val c = got.getOrElse("HEAVY", 0L)
      assert(c > 0, s"heavy item missing at parts=$parts: $got")
      assert(c >= heavyCount - n / 9 && c <= heavyCount,
        s"undercount bound violated at parts=$parts: $c")
    }
  }

  test("type errors are analysis-time and k is validated") {
    FreqSketch.register(spark)
    val e = intercept[Exception] {
      Seq(1L).toDF("x").agg(expr("freq_sketch(x)")).collect()
    }
    assert(e.getMessage.contains("STRING"), e.getMessage)
    val e2 = intercept[Exception] {
      Seq("a").toDF("w").agg(expr("freq_sketch(w, 2.5)")).collect()
    }
    assert(e2.getMessage.contains("int literal"), e2.getMessage)
  }
}
