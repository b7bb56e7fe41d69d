package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))

    inject("vec_dot", es => functions.VecDot(es(0), es(1)))
    inject("rolling_hash", es => functions.RollingHash(es(0)))
    inject("z_interleave", es => functions.ZInterleave(es(0), es(1)))
    inject("pq_encode", es => functions.PqEncode(es(0), es(1)))
    inject("pq_adc_table", es => functions.PqAdcTable(es(0), es(1)))
    inject("pq_adc_score", es => functions.PqAdcScore(es(0), es(1),
      es(2).eval().asInstanceOf[Int]))
  }
}
