package graft.api

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.pipeline.{PipelineSpec, StepSpec}

/** JSON form of a pipeline spec — the engine's `config.json`/`celebi.yaml`
  * equivalent (SURVEY.md §1.2): steps with transform name, named inputs and
  * string params, plus optional roots (default: every step). */
object SpecJson {
  private implicit val formats: Formats = DefaultFormats

  def parse(body: String): (PipelineSpec, Seq[String]) = {
    val j = JsonMethods.parse(body)
    // json4s extracts a MISSING field to an empty Seq/Map rather than
    // erroring, and extractOrElse swallows malformed shapes — both would
    // turn a typo'd spec into a silent no-op pipeline. Require 'steps'
    // explicitly and extract optional maps strictly (a present-but-wrong
    // shape must be a parse error, not an empty default).
    def strictMap(v: JValue, what: String): Map[String, String] = v match {
      case JNothing | JNull => Map.empty
      case o: JObject => o.extract[Map[String, String]]
      case other => sys.error(s"'$what' must be a string map, got ${other.getClass.getSimpleName}")
    }
    val stepsJson = j \ "steps" match {
      case JNothing | JNull => sys.error("spec has no 'steps' array")
      case v => v.extract[Seq[JValue]]
    }
    if (stepsJson.isEmpty) sys.error("spec 'steps' is empty")
    val steps = stepsJson.map { s =>
      StepSpec(
        id = (s \ "id").extract[String],
        transform = (s \ "transform").extract[String],
        inputs = strictMap(s \ "inputs", "inputs"),
        params = strictMap(s \ "params", "params"))
    }
    // json4s extracts JNothing to an EMPTY Seq (not a fallback), so a spec
    // without "roots" must be special-cased or nothing would execute
    val roots = j \ "roots" match {
      case JNothing | JNull => steps.map(_.id)
      case v => v.extract[Seq[String]]
    }
    (PipelineSpec(steps), roots)
  }
}
