package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The TopKRewrite optimizer rule: the natural `row_number() <= k` window
  * top-k must silently become the bounded topk_sketch aggregate — same
  * rows, no sort, no window — and must NOT fire when the equivalence
  * gates don't hold. */
class TopKRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = graft.core.Sessions.tune(
      SparkSession.builder().master("local[4]").appName("graft-topk-rewrite"), "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val sfDir = "/root/testdata/sf0.001"

  private def physicalOps(df: DataFrame): Seq[String] = {
    df.collect()
    def all(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => p.children ++ p.subqueries
      }
      p +: kids.flatMap(all)
    }
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    all(root).map(_.nodeName)
  }

  private def topkWindow(s: SparkSession, extra: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    graft.core.Tables.orders(s, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select((Seq("o_custkey", "o_orderkey", "o_totalprice", "rn") ++ extra)
        .map(col): _*)
  }

  test("the w5 window shape rewrites to the bounded aggregate with identical rows") {
    val rewritten = topkWindow(spark)
    val ops = physicalOps(rewritten)
    assert(!ops.exists(_.contains("Window")), s"window survived: $ops")
    assert(ops.exists(_.contains("ObjectHashAggregate")), s"no sketch aggregate: $ops")
    // rows must equal the un-rewritten window form (shared plain session)
    val plain = topkWindow(SparkSpec.session)
    assert(physicalOps(plain).exists(_.contains("Window")),
      "control session unexpectedly rewrote — test is vacuous")
    val a = rewritten.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val b = plain.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a == b, s"rewrite changed rows: only-rewritten=${(a -- b).take(3)} " +
      s"only-window=${(b -- a).take(3)}")
  }

  test("the rule declines when an extra column is live (aggregate would drop it)") {
    val df = topkWindow(spark, extra = Seq("o_orderdate"))
    assert(physicalOps(df).exists(_.contains("Window")),
      "rewrite fired despite a live non-key column — unsound")
  }

  test("the rule declines for rank() and for ascending value order") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ranked = graft.core.Tables.orders(spark, sfDir)
      .withColumn("rn", rank().over(w)).where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    assert(physicalOps(ranked).exists(_.contains("Window")))
    val wAsc = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val asc = graft.core.Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(wAsc)).where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    assert(physicalOps(asc).exists(_.contains("Window")))
  }

  test("ties and negative zero rank identically to the window (adversarial data)") {
    import spark.implicits._
    val rows = Seq(
      (1L, 5.0, 1L), (1L, 5.0, 2L), (1L, 5.0, 3L), (1L, 5.0, 4L),
      (1L, -0.0, 5L), (1L, 0.0, 6L), (1L, 7.5, 7L),
      (2L, -0.0, 8L), (2L, 0.0, 9L), (2L, -1.0, 10L))
    val df = rows.toDF("g", "v", "id")
    def shape(s: SparkSession, in: DataFrame): Set[(Long, Long, Double, Int)] = {
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      in.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
        .select(col("g"), col("id"), col("v"), col("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    }
    val rewritten = shape(spark, df)
    val windowed = shape(SparkSpec.session,
      { import SparkSpec.session.implicits._; rows.toDF("g", "v", "id") })
    assert(rewritten == windowed,
      s"only-rewritten=${rewritten -- windowed} only-window=${windowed -- rewritten}")
  }

  test("null values and null ids rank exactly like DESC NULLS LAST / ASC NULLS FIRST") {
    // groups with fewer than k non-null values force null rows INTO the
    // top-k — the case a null-dropping sketch gets wrong
    val rows: Seq[(Long, Option[Double], Option[Long])] = Seq(
      (1L, Some(5.0), Some(1L)), (1L, None, Some(2L)), (1L, None, None),
      (2L, None, Some(4L)), (2L, None, Some(3L)),
      (3L, Some(1.0), None), (3L, Some(1.0), Some(6L)), (3L, Some(2.0), Some(7L)))
    def shape(s: SparkSession): Set[(Long, Option[Long], Option[Double], Int)] = {
      import s.implicits._
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      rows.toDF("g", "v", "id")
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
        .select(col("g"), col("id"), col("v"), col("rn"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getInt(3))).toSet
    }
    val rewritten = shape(spark)
    val windowed = shape(SparkSpec.session)
    assert(rewritten == windowed,
      s"only-rewritten=${rewritten -- windowed} only-window=${windowed -- rewritten}")
  }

  test("the conf kill switch restores the window plan") {
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    try {
      assert(physicalOps(topkWindow(spark)).exists(_.contains("Window")),
        "rule fired with the kill switch set")
    } finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }
}
