package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors}
import scala.concurrent.{ExecutionContext, Future}
import scala.util.{Failure, Success}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.pipeline._

/** Thin HTTP facade mirroring the reference server's route surface
  * (`/root/reference/Yuki/server/routes/`) over the Spark-native runner —
  * JDK built-in `HttpServer` + json4s (both already on the classpath, zero
  * new dependencies):
  *
  *   - `GET  /ping`                        — connectivity check (A32,
  *     `/root/reference/Yuki/server/utils.py:7-13`)
  *   - `POST /run` (pipeline spec JSON)    — async submit; returns run id
  *     (A4+A8, `/root/reference/Yuki/server/routes/execution.py:18-78`)
  *   - `GET  /status/<run>`                — workflow + per-step statuses
  *     (A17/A23/A34, `/root/reference/Yuki/server/routes/status.py:22-138`)
  *   - `GET  /collect/<run>/<step>`        — output manifest (A21,
  *     `/root/reference/Yuki/server/routes/workflow.py:12-16`)
  *   - `POST /purge/<run>/<step>`          — drop materialized output (A6)
  *   - `POST /kill/<run>`                  — cancel in-flight jobs (A25)
  *
  * Spec body: `{"steps": [{"id", "transform", "inputs": {alias: stepId},
  * "params": {k: v}}], "roots": [stepId]}`.
  *
  * The server owns no data path — every byte moves through Spark; handlers
  * only touch runner metadata, matching the reference's driver-side-only
  * server role.
  */
final class HttpApi(runner: Runner, port: Int = 0) {
  private implicit val formats: Formats = DefaultFormats
  private implicit val ec: ExecutionContext =
    ExecutionContext.fromExecutor(Executors.newFixedThreadPool(4))

  private case class RunState(spec: PipelineSpec, roots: Seq[String],
      future: Future[Map[String, String]])
  private val runs = new ConcurrentHashMap[String, RunState]()
  private val counter = new java.util.concurrent.atomic.AtomicLong()

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.setExecutor(Executors.newFixedThreadPool(8))

  // push-based stage progress for /status (reference polled .done markers)
  private val listener = RunListener.install(runner.session)

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: JValue): Unit = {
    val bytes = JsonMethods.compact(JsonMethods.render(body))
      .getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
  private def notFound(ex: HttpExchange): Unit =
    respond(ex, 404, JObject("error" -> JString("not found")))

  private def parseSpec(body: String): (PipelineSpec, Seq[String]) =
    SpecJson.parse(body)

  private def workflowStatus(st: RunState): String =
    st.future.value match {
      case None => "running"                    // VWorkflow.py:454-473 enum
      case Some(Success(_)) => "finished"
      case Some(Failure(_)) => "failed"
    }

  server.createContext("/ping", (ex: HttpExchange) =>
    respond(ex, 200, JObject("status" -> JString("Connected"))))

  server.createContext("/run", (ex: HttpExchange) => {
    try {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val (spec, roots) = parseSpec(body)
      val runId = s"run${counter.incrementAndGet()}"
      runs.put(runId, RunState(spec, roots, Future(runner.execute(spec, roots))))
      respond(ex, 202, JObject("run_id" -> JString(runId)))
    } catch {
      case e: Exception =>
        respond(ex, 400, JObject("error" -> JString(String.valueOf(e.getMessage))))
    }
  })

  server.createContext("/status/", (ex: HttpExchange) => {
    val runId = ex.getRequestURI.getPath.stripPrefix("/status/")
    Option(runs.get(runId)) match {
      case None => notFound(ex)
      case Some(st) =>
        // statusOf keys by impression id, so runs whose specs reuse step
        // names don't clobber each other's reported state
        val steps = st.spec.steps.map { s =>
          s.id -> JString(runner.statusOf(st.spec, s.id).name)
        }
        // progress over THIS run's job groups (its impression ids) only —
        // concurrent runs don't see each other's stages
        val (done, seen) =
          listener.progress(st.spec.steps.map(s => runner.impressionId(st.spec, s.id)).toSet)
        respond(ex, 200, JObject(
          "workflow" -> JString(workflowStatus(st)),
          "stages_completed" -> JLong(done),
          "stages_submitted" -> JLong(seen),
          "steps" -> JObject(steps: _*)))
    }
  })

  /** (run, step) from the path, only if both exist — unknown step ids must
    * 404, not escape as NoSuchElementException (which the JDK server turns
    * into a dropped connection). */
  private def resolve(path: String, prefix: String): Option[(RunState, String)] =
    path.stripPrefix(prefix).split("/") match {
      case Array(runId, stepId) =>
        Option(runs.get(runId)).filter(_.spec.byId.contains(stepId)).map((_, stepId))
      case _ => None
    }

  server.createContext("/collect/", (ex: HttpExchange) => {
    resolve(ex.getRequestURI.getPath, "/collect/")
      .flatMap { case (st, stepId) => runner.collect(st.spec, stepId) } match {
      case None => notFound(ex)
      case Some(a) => respond(ex, 200, JObject(
        "step" -> JString(a.id), "impression" -> JString(a.impression),
        "path" -> JString(a.path),
        "schema" -> JString(a.schemaDDL), "rows" -> JLong(a.rows)))
    }
  })

  server.createContext("/purge/", (ex: HttpExchange) => {
    resolve(ex.getRequestURI.getPath, "/purge/") match {
      case Some((st, stepId)) =>
        // reset, not bare purge: dropping the output while leaving the
        // sticky terminal status would make the step unrunnable forever
        runner.reset(st.spec, stepId)
        respond(ex, 200, JObject("purged" -> JString(stepId)))
      case None => notFound(ex)
    }
  })

  server.createContext("/kill/", (ex: HttpExchange) => {
    val runId = ex.getRequestURI.getPath.stripPrefix("/kill/")
    Option(runs.get(runId)) match {
      case None => notFound(ex)
      case Some(st) =>
        st.spec.steps.foreach(s => runner.kill(st.spec, s.id))
        respond(ex, 200, JObject("killed" -> JString(runId)))
    }
  })

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
