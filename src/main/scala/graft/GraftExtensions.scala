package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Session-extensions entry point — the standalone-library wiring: a user
  * switching from the reference runs
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * (or `.withExtensions(new GraftExtensions)` on a builder) and every graft
  * custom expression is a first-class SQL function in that session — usable
  * from `spark.sql("SELECT vec_dot(a, b) ...")`, the column API via
  * `call_function`, and thriftserver/notebook SQL, with no per-operator
  * `register()` calls. The operator entry points keep their internal
  * `X.register(spark)` calls so each query stays self-contained when the
  * extension isn't installed; both paths bind the same expression classes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  /** A small-int literal argument on the SQL surface: SQL integer
    * literals can parse as TINYINT/SMALLINT/INT/BIGINT depending on the
    * writer, so accept any machine-int Literal (widened, with a range
    * check) and refuse everything else with a TYPED analysis error — a
    * bare eval().asInstanceOf[Int] threw an opaque ClassCastException/NPE
    * on e.g. `pq_adc_score(t, c, 16L)` or a non-foldable column
    * (ADVICE r6). */
  private def intLiteral(fn: String, arg: String, e: Expression): Int = {
    def bad() = throw new org.apache.spark.sql.AnalysisException(
      "_LEGACY_ERROR_TEMP_1332", // the generic analysis-error message class
      Map("errorMessage" ->
        s"$fn: $arg must be an integer literal, got ${e.sql}"))
    e match {
      case Literal(v: Byte, ByteType) => v.toInt
      case Literal(v: Short, ShortType) => v.toInt
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) if v.isValidInt => v.toInt
      // a folded constant that is not a bare Literal yet (CAST(1 AS
      // BIGINT), 8 * 2, …): constant-fold it here — the builder runs
      // before the optimizer would
      case f if f.resolved && f.foldable =>
        f.eval() match {
          case v: Byte => v.toInt
          case v: Short => v.toInt
          case v: Int => v
          case v: Long if v.isValidInt => v.toInt
          case _ => bad()
        }
      case _ => bad()
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))

    // Optimizer rule: `row_number() <= k` window top-k rewrites to the
    // bounded topk_sketch aggregate (no per-group sort) — see
    // [[graft.plans.TopKRewrite]]. Disable per session with
    // spark.graft.topkRewrite.enabled=false.
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)

    inject("vec_dot", es => functions.VecDot(es(0), es(1)))
    inject("rolling_hash", es => functions.RollingHash(es(0)))
    inject("z_interleave", es => functions.ZInterleave(es(0), es(1)))
    inject("pq_encode", es => functions.PqEncode(es(0), es(1)))
    inject("pq_adc_table", es => functions.PqAdcTable(es(0), es(1)))
    inject("pq_adc_score", es => functions.PqAdcScore(es(0), es(1),
      intLiteral("pq_adc_score", "num_subspaces", es(2))))
    // the Misra-Gries heavy-hitters aggregate (g13) — both arities
    inject("freq_sketch", {
      case Seq(child) =>
        functions.FreqSketch(child).toAggregateExpression()
      case Seq(child, kk) =>
        functions.FreqSketch(child,
          k = intLiteral("freq_sketch", "k", kk)).toAggregateExpression()
      case exprs => throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_1332",
        Map("errorMessage" ->
          s"freq_sketch expects 1-2 arguments, got ${exprs.length}"))
    })
    // the minhash aggregate (l5b/l5d's signature builder) — both arities,
    // matching MinHashSketch.register's own SQL path (ADVICE r6: the
    // no-code-changes install must resolve every graft function)
    // the bounded top-k-per-group aggregate (w5b)
    inject("topk_sketch", {
      case Seq(v, id, k) =>
        functions.TopKSketch(v, id,
          k = intLiteral("topk_sketch", "k", k)).toAggregateExpression()
      case exprs => throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_1332",
        Map("errorMessage" ->
          s"topk_sketch expects (value, id, k), got ${exprs.length} args"))
    })
    inject("minhash_sketch", {
      case Seq(child) =>
        functions.MinHashSketch(child).toAggregateExpression()
      case Seq(child, k) =>
        functions.MinHashSketch(child,
          numHashes = intLiteral("minhash_sketch", "num_hashes", k))
          .toAggregateExpression()
      case exprs => throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_1332",
        Map("errorMessage" ->
          s"minhash_sketch expects 1-2 arguments, got ${exprs.length}"))
    })
  }
}
