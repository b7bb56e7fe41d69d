package graft.pipeline

/** Pipeline model — the typed replacement for the reference's impression /
  * job metadata (SURVEY.md §1.2, §2 Part C).
  *
  * A [[StepSpec]] is the analogue of a task impression: a registered
  * transformation applied to named inputs with string parameters
  * (cf. `/root/reference/Yuki/kernel/container_job.py:34-42,397-408`).
  * A [[PipelineSpec]] is the DAG (`config.json` `dependencies`,
  * `/root/reference/Yuki/kernel/VJob.py:312-314`).
  */
final case class StepSpec(
    id: String,
    transform: String,
    inputs: Map[String, String] = Map.empty, // alias -> upstream step id
    params: Map[String, String] = Map.empty)

final case class PipelineSpec(steps: Seq[StepSpec]) {
  val byId: Map[String, StepSpec] = steps.map(s => s.id -> s).toMap
  require(byId.size == steps.size, "duplicate step ids")

  /** Content-addressed impression id per step (the reference's impression
    * uuid, `/root/reference/Yuki/kernel/VJob.py:25`): SHA-256 over transform
    * + sorted params + input impression ids. Computed ONCE per spec in
    * dependency order — a naive recursive definition is exponential on
    * diamond-shaped DAGs. */
  lazy val impressionIds: Map[String, String] = {
    val memo = scala.collection.mutable.Map[String, String]()
    val inStack = scala.collection.mutable.Set[String]()
    def hash(id: String): String = memo.getOrElseUpdate(id, {
      // guarded like topoOrder: this map covers ALL steps, including ones
      // outside the requested roots, so a cycle there must error cleanly
      // rather than StackOverflowError
      require(!inStack.contains(id), s"cycle through step $id")
      inStack += id
      val step = byId.getOrElse(id, sys.error(s"unknown step $id"))
      // length-prefixed, section-tagged k/v components: without the length
      // prefixes, params {"a=b":"c"} and {"a":"b=c"} would collide; without
      // the section tag, a param whose VALUE is a 32-hex hash (the
      // documented "rev" pinning pattern) would collide with an input alias
      // of the same name whose dependency hashes to that value
      def comp(kind: String, k: String, v: String) =
        s"$kind${k.length}:$k=${v.length}:$v"
      val inputSig = step.inputs.toSeq.sortBy(_._1)
        .map { case (alias, dep) => comp("i", alias, hash(dep)) }
      inStack -= id
      val paramSig = step.params.toSeq.sorted.map { case (k, v) => comp("p", k, v) }
      // the transform name gets the same length prefix as the other
      // components: an unprefixed head would let a crafted transform name
      // embedding the separator byte forge another step's payload
      val payload =
        (s"t${step.transform.length}:${step.transform}" +: (paramSig ++ inputSig))
          .mkString("\u001f")
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(16).map("%02x".format(_)).mkString
    })
    steps.map(s => s.id -> hash(s.id)).toMap
  }

  /** Post-order DFS from the requested roots over input edges — the same
    * construction as the reference's `construct_workflow_jobs`
    * (`/root/reference/Yuki/kernel/VWorkflow.py:402-452`): dependencies
    * first, memoized, cycle-checked. */
  def topoOrder(roots: Seq[String]): Seq[StepSpec] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    val inStack = scala.collection.mutable.Set[String]()
    def visit(id: String): Unit = {
      if (seen.contains(id)) return
      require(!inStack.contains(id), s"cycle through step $id")
      inStack += id
      val step = byId.getOrElse(id, sys.error(s"unknown step $id"))
      step.inputs.values.foreach(visit)
      inStack -= id
      seen += id
    }
    roots.foreach(visit)
    seen.toSeq.map(byId)
  }
}

/** Step status state machine — the one nontrivial "type" in the reference
  * (SURVEY.md §1.3; values observed in
  * `/root/reference/Yuki/kernel/VJob.py:127-254`). */
sealed abstract class StepStatus(val name: String) {
  /** Terminal states are sticky (`VJob.py:248-249,269-270`). */
  def isTerminal: Boolean = this match {
    case StepStatus.Finished | StepStatus.Failed | StepStatus.Archived => true
    case _ => false
  }
}
object StepStatus {
  case object Raw extends StepStatus("raw")
  case object Waiting extends StepStatus("waiting")
  case object Running extends StepStatus("running")
  case object Finished extends StepStatus("finished")
  case object Failed extends StepStatus("failed")
  case object Archived extends StepStatus("archived")

  val all: Seq[StepStatus] = Seq(Raw, Waiting, Running, Finished, Failed, Archived)
  def parse(s: String): StepStatus =
    all.find(_.name == s).getOrElse(sys.error(s"unknown status $s"))

  /** Submission filter: only raw/failed tasks are admitted for (re-)run
    * (`/root/reference/Yuki/server/routes/execution.py:42-44`). */
  def canSubmit(s: StepStatus): Boolean = s == Raw || s == Failed

  /** Guarded transition: terminal states only move via explicit re-run
    * (raw), mirroring `_update_job_status` (`VJob.py:227-254`). */
  def transition(from: StepStatus, to: StepStatus): StepStatus =
    if (from.isTerminal && to != Raw) from else to
}

/** Parameter binding — `${name}` substitution with keys applied in sorted
  * order, exactly the reference's rule
  * (`/root/reference/Yuki/kernel/container_job.py:255-270`). Unknown
  * placeholders are left intact. */
final case class ParamMap(params: Map[String, String]) {
  def substitute(template: String): String =
    params.toSeq.sortBy(_._1).foldLeft(template) { case (acc, (k, v)) =>
      acc.replace("${" + k + "}", v)
    }
  def get(key: String): Option[String] = params.get(key)
  def apply(key: String): String = params(key)
  def getOrElse(key: String, default: String): String =
    params.getOrElse(key, default)
}
