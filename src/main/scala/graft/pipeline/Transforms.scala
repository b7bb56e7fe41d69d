package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.core.Tables

/** The engine's standard transform library.
  *
  * `source` reads a fixture table; `query` invokes any declared operator
  * from [[graft.SparkEntry.queries]] — which makes the whole SURVEY.md §2B
  * inventory available as pipeline steps, the typed analogue of the
  * reference resolving a task's algorithm by impression lookup
  * (`/root/reference/Yuki/kernel/container_job.py:44-61`).
  */
object Transforms {
  def standard(): TransformRegistry = {
    val r = new TransformRegistry
    r.register("source") { (s, _, p) => Tables.load(s, p("dir"), p("table")) }
    r.register("query") { (s, _, p) => SparkEntry.queries(p("name"))(s, p("dir")) }
    r.register("identity") { (_, in, _) => in.values.head }
    r.register("sql") { (s, in, p) =>
      in.foreach { case (alias, df) => df.createOrReplaceTempView(alias) }
      s.sql(ParamMap(p.params).substitute(p("sql")))
    }
    r
  }
}

/** Stage-level progress listener — replaces the reference's poll-based
  * status scan (`.done`-marker counting,
  * `/root/reference/Yuki/kernel/dry_workflow.py:163-217`) with push
  * updates from the Spark scheduler: progress = stages completed / seen,
  * keyed by the step's job group (= impression id). Both sides count
  * DISTINCT stage ids, so retries and resubmissions don't inflate either
  * number past the other. */
final class RunListener extends SparkListener {
  private val submitted = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  private val completed = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  override def onStageSubmitted(ev: SparkListenerStageSubmitted): Unit = {
    val group = Option(ev.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).orNull
    if (group != null) submitted.add(ev.stageInfo.stageId)
  }
  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
    if (submitted.contains(ev.stageInfo.stageId)) completed.add(ev.stageInfo.stageId)

  /** (completed, submitted) distinct-stage counts across all tracked steps. */
  def progress: (Long, Long) = (completed.size.toLong, submitted.size.toLong)
}

object RunListener {
  def install(spark: SparkSession): RunListener = {
    val l = new RunListener
    spark.sparkContext.addSparkListener(l)
    l
  }
}
