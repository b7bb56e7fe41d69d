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
    val steps = (j \ "steps").extract[Seq[JValue]].map { s =>
      StepSpec(
        id = (s \ "id").extract[String],
        transform = (s \ "transform").extract[String],
        inputs = (s \ "inputs").extractOrElse[Map[String, String]](Map.empty),
        params = (s \ "params").extractOrElse[Map[String, String]](Map.empty))
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
