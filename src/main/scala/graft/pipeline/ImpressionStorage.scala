package graft.pipeline

/** Cross-runner collect/kill dispatch (A24) — the engine's analogue of the
  * reference's `ImpressionStorage`
  * (`/root/reference/Yuki/kernel/impression_storage.py:21-75`): iterate
  * EVERY registered runner and dispatch on each runner's own job status —
  * finished runners contribute results, failed runners contribute logs,
  * everything else is skipped. The reference downloads stageout files /
  * log files per machine; here a runner's "download" is its warehouse
  * manifest ([[Runner.collect]]) and its "logs" are the durable status
  * record with timings ([[Runner.runOf]]) — the driver-side artifacts that
  * replace per-machine files in a Spark deployment.
  */
object ImpressionStorage {
  /** One runner's contribution to a collect sweep. */
  final case class Dispatch(
      runner: String,
      status: StepStatus,
      action: String, // "results" | "logs" | "skipped"
      artifact: Option[StepArtifact],
      record: Option[StepRun])
}

final class ImpressionStorage(runners: Seq[(String, Runner)]) {
  import ImpressionStorage.Dispatch

  private def contexts(spec: PipelineSpec, id: String): Seq[(String, Runner, StepStatus)] =
    runners.map { case (name, r) => (name, r, r.statusOf(spec, id)) }

  /** `collect()` (impression_storage.py:39-47): finished → results,
    * failed → logs, otherwise skipped. */
  def collect(spec: PipelineSpec, id: String): Seq[Dispatch] =
    contexts(spec, id).map {
      case (name, r, StepStatus.Finished) =>
        Dispatch(name, StepStatus.Finished, "results",
          r.collect(spec, id), Some(r.runOf(spec, id)))
      case (name, r, StepStatus.Failed) =>
        Dispatch(name, StepStatus.Failed, "logs", None, Some(r.runOf(spec, id)))
      case (name, _, st) => Dispatch(name, st, "skipped", None, None)
    }

  /** `collect_outputs()` (impression_storage.py:49-53): results only, and
    * only from finished runners. */
  def collectOutputs(spec: PipelineSpec, id: String): Seq[Dispatch] =
    collect(spec, id).filter(_.action == "results")

  /** `collect_logs()` (impression_storage.py:55-60): the status record from
    * every runner that ran to a terminal state. */
  def collectLogs(spec: PipelineSpec, id: String): Seq[Dispatch] =
    contexts(spec, id).collect {
      case (name, r, st @ (StepStatus.Finished | StepStatus.Failed)) =>
        Dispatch(name, st, "logs", None, Some(r.runOf(spec, id)))
    }

  /** `kill()` (impression_storage.py:33-37): cancel the step on EVERY
    * runner — each cancels its own session's job group and marks its
    * durable record failed. One deliberate divergence: the reference sets
    * "failed" unconditionally, but this engine's sticky-terminal status
    * machine refuses to demote an already-FINISHED impression (its output
    * is materialized and valid; there is nothing in flight to kill), so a
    * sweep only fails steps that were raw/waiting/running. */
  def kill(spec: PipelineSpec, id: String): Unit =
    runners.foreach { case (_, r) => r.kill(spec, id) }

  /** `get_info()` (impression_storage.py:71-75): first runner with any
    * activity for the impression, or UNDEFINED. */
  def getInfo(spec: PipelineSpec, id: String): String =
    contexts(spec, id)
      .find { case (_, _, st) => st != StepStatus.Raw }
      .map { case (name, r, _) => s"$name ${r.impressionId(spec, id)}" }
      .getOrElse("UNDEFINED")
}
