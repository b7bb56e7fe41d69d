package graft.api

import java.nio.file.{Files, Paths}

import graft.core.Sessions
import graft.pipeline.{Runner, Transforms}

/** Command-line entry — the engine's equivalent of the reference's
  * server_main + submit scripts (`/root/reference/Yuki/server_main.py`):
  *
  *   run <spec.json> <warehouse>     execute a pipeline, print the manifest
  *   serve <warehouse> [port]        start the HTTP facade (default 3315,
  *                                   the reference's port)
  */
object Cli {
  def main(args: Array[String]): Unit = args.toList match {
    case "run" :: specPath :: warehouse :: Nil =>
      val (spec, roots) = SpecJson.parse(
        new String(Files.readAllBytes(Paths.get(specPath))))
      val spark = Sessions.local()
      try {
        val runner = new Runner(spark, Transforms.standard(), warehouse)
        runner.execute(spec, roots)
        // print EVERY step — show() defaults to 20 rows and would silently
        // truncate larger pipelines' primary output
        runner.manifest(spec).show(spec.steps.size, truncate = false)
      } finally spark.stop()

    case "serve" :: warehouse :: rest
        if rest.lengthIs <= 1 && rest.forall(_.forall(_.isDigit)) =>
      val port = rest.headOption.map(_.toInt).getOrElse(3315)
      val spark = Sessions.local()
      val runner = new Runner(spark, Transforms.standard(), warehouse)
      val api = new HttpApi(runner, port,
        Some(s => new Runner(s, Transforms.standard(), warehouse))).start()
      println(s"graft serving on port ${api.boundPort} (warehouse: $warehouse)")
      Thread.currentThread().join() // serve until killed

    case _ =>
      System.err.println(
        """usage: graft.api.Cli run <spec.json> <warehouse>
          |       graft.api.Cli serve <warehouse> [port]""".stripMargin)
      sys.exit(2)
  }
}
