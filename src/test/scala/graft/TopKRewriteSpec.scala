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

  test("the rule declines for rank() and for a non-default null ordering") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ranked = graft.core.Tables.orders(spark, sfDir)
      .withColumn("rn", rank().over(w)).where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    assert(physicalOps(ranked).exists(_.contains("Window")))
    // DESC NULLS FIRST is not the direction's default null ordering — the
    // sketch's comparator would place nulls last, so the rule must decline
    val wNf = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc_nulls_first, col("o_orderkey"))
    val nf = graft.core.Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(wNf)).where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    assert(physicalOps(nf).exists(_.contains("Window")),
      "rewrite fired on a non-default null ordering — unsound")
  }

  test("parity matrix: value type x direction (and id direction) match the window") {
    // Every cell: the rewritten plan must drop the Window AND return
    // row-identical results to the plain session's window — over data
    // with ties, nulls, and (for doubles) -0.0/NaN. DECIMAL DESC is the
    // real-world revenue top-k the Double-only gate used to decline.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", LongType, nullable = false),
      StructField("vl", LongType, nullable = true),
      StructField("vi", IntegerType, nullable = true),
      StructField("vd", DecimalType(18, 2), nullable = true),
      StructField("vs", StringType, nullable = true),
      StructField("vf", DoubleType, nullable = true),
      StructField("id", LongType, nullable = true)))
    val rows = Seq(
      Row(1L, 10L, 10, BigDecimal("10.50"), "beta", 1.5, 1L),
      Row(1L, 10L, 10, BigDecimal("10.50"), "beta", 1.5, 2L),      // full tie
      Row(1L, 7L, 7, BigDecimal("7.25"), "alpha", -0.0, 3L),
      Row(1L, 7L, 7, BigDecimal("7.25"), "Alpha", 0.0, 4L),        // case + -0.0
      Row(1L, null, null, null, null, null, 5L),                   // null value
      Row(1L, 12L, 12, BigDecimal("12.00"), "gamma", Double.NaN, null), // null id
      Row(2L, -3L, -3, BigDecimal("-3.10"), "", -9.9, 7L),
      Row(2L, null, null, null, null, null, 8L),
      Row(2L, null, null, null, null, null, 9L),                   // < k non-nulls
      Row(3L, 0L, 0, BigDecimal("0.00"), "zzz", 0.0, 10L))
    def df(s: SparkSession) = s.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    def shape(s: SparkSession, vCol: String, vDesc: Boolean, idDesc: Boolean) = {
      val v = if (vDesc) col(vCol).desc else col(vCol).asc
      val i = if (idDesc) col("id").desc else col("id").asc
      val w = Window.partitionBy(col("g")).orderBy(v, i)
      df(s).select(col("g"), col(vCol), col("id"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
    }
    for {
      vCol <- Seq("vl", "vi", "vd", "vs", "vf")
      vDesc <- Seq(true, false)
      idDesc <- Seq(true, false)
    } {
      val label = s"$vCol vDesc=$vDesc idDesc=$idDesc"
      val rewritten = shape(spark, vCol, vDesc, idDesc)
      assert(!physicalOps(rewritten).exists(_.contains("Window")),
        s"[$label] window survived the rewrite")
      val plain = shape(SparkSpec.session, vCol, vDesc, idDesc)
      assert(physicalOps(plain).exists(_.contains("Window")),
        s"[$label] control session rewrote — test is vacuous")
      // stringify cells: Scala's == on boxed doubles is numeric, so a
      // NaN row would never equal itself in a Set; String.valueOf keeps
      // NaN/-0.0 distinctions bit-faithful
      val a = rewritten.collect().map(_.toSeq.map(String.valueOf)).toSet
      val b = plain.collect().map(_.toSeq.map(String.valueOf)).toSet
      assert(a == b, s"[$label] rows diverge: only-rewritten=" +
        s"${(a -- b).take(3)} only-window=${(b -- a).take(3)}")
    }
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

  test("the conf kill switch restores the window plan, case-insensitively") {
    // mixed-case values must behave like their lowercase forms (ADVICE:
    // a case-sensitive == "true" silently disabled the rule on "TRUE")
    spark.conf.set("spark.graft.topkRewrite.enabled", "False")
    try {
      assert(physicalOps(topkWindow(spark)).exists(_.contains("Window")),
        "rule fired with the kill switch set")
      spark.conf.set("spark.graft.topkRewrite.enabled", "TRUE")
      assert(!physicalOps(topkWindow(spark)).exists(_.contains("Window")),
        "enabled=TRUE (uppercase) silently disabled the rule")
    } finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }
}
