package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class is the no-code-changes install path
  * (`--conf spark.sql.extensions=graft.GraftExtensions`). Same-JVM tests
  * can't exercise the conf route (the extension conf is read at
  * SparkContext/session bootstrap), so this spec installs through
  * `builder.withExtensions(new GraftExtensions)` — the identical
  * `apply(SparkSessionExtensions)` under test — on a DEDICATED session
  * that must not inherit the shared session's per-session temp-function
  * registrations (that would make resolution vacuously pass). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // build around the shared session: clear the default so getOrCreate
    // creates a NEW session (reusing the JVM's SparkContext), then restore
    // so later suites still get SparkSpec's no-fallback session
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = graft.core.Sessions.tune(
      SparkSession.builder().master("local[4]").appName("graft-extensions-spec"), "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("all graft functions resolve from plain SQL via the extensions install") {
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
                z_interleave(3, 0) AS z,
                rolling_hash('abc') AS rh,
                pq_encode(array(0.9D, 0.1D), array(array(array(0.0D, 0.0D), array(1.0D, 0.0D)))) AS code,
                pq_adc_score(array(0.5D, 0.25D), 1L, 1) AS adc
      """).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 5L)
    assert(!r.isNullAt(2))
    // codebook: 1 subspace, 2 centroids — (0.9, 0.1) is nearer (1, 0)
    assert(r.getLong(3) == 1L)
    // code 1 selects tbl[1] in the single subspace
    assert(r.getDouble(4) == 0.25)
  }

  test("minhash_sketch resolves from SQL in both arities (ADVICE r6)") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("h")
    df.createOrReplaceTempView("hs")
    val sig = spark.sql("SELECT minhash_sketch(h) AS s FROM hs")
      .head().getSeq[Long](0)
    assert(sig.length == 32) // default k
    val sig8 = spark.sql("SELECT minhash_sketch(h, 8) AS s FROM hs")
      .head().getSeq[Long](0)
    assert(sig8.length == 8 && sig8 == sig.take(8))
  }

  test("topk_sketch resolves from SQL via the extensions install") {
    import spark.implicits._
    Seq((1L, 5.0, 10L), (1L, 7.0, 11L), (1L, 7.0, 9L), (1L, 3.0, 12L))
      .toDF("g", "v", "id").createOrReplaceTempView("tk")
    val top = spark.sql(
      "SELECT topk_sketch(v, id, 2) AS t FROM tk GROUP BY g")
      .head().getSeq[org.apache.spark.sql.Row](0)
    // rank: (7.0, 9), (7.0, 11) — value desc, id asc tiebreak, k=2 cut
    assert(top.map(r => (r.getDouble(0), r.getLong(1))) ==
      Seq((7.0, 9L), (7.0, 11L)))
  }

  test("small-int literal args: BIGINT literals widen, non-literals get a typed error (ADVICE r6)") {
    // SQL writers produce BIGINT literals freely — must widen, not NPE
    val r = spark.sql("SELECT pq_adc_score(array(0.5D, 0.25D), 1L, CAST(1 AS BIGINT)) AS adc")
      .head().getDouble(0)
    assert(r == 0.25)
    // a non-foldable third arg is a descriptive AnalysisException, not a
    // ClassCastException/NPE from eval() at function-build time
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT pq_adc_score(array(0.5D), 0L, id) FROM range(1)").head()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
    val err2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sketch(1L, 2.5)").head()
    }
    assert(err2.getMessage.contains("integer literal"), err2.getMessage)
  }

  test("pq_adc_table resolves and computes the per-centroid dot table") {
    val viaSql = spark.sql(
      """SELECT pq_adc_table(array(0.5D, 0.5D),
                             array(array(array(1.0D, 0.0D), array(0.0D, 1.0D)))) AS t""")
      .head().getSeq[Double](0)
    assert(viaSql == Seq(0.5, 0.5))
  }

  test("a session WITHOUT the extensions does not see the functions (not vacuous)") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val bare = graft.core.Sessions.tune(
      SparkSession.builder().master("local[4]").appName("graft-bare-spec"), "4")
      .getOrCreate()
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    val err = intercept[Exception] {
      bare.sql("SELECT z_interleave(1, 2)").head()
    }
    assert(err.getMessage.contains("z_interleave"))
  }
}
