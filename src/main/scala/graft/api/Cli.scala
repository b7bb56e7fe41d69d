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
  *   ingest <warehouse> <name> <path> [format]
  *                                   register an external dataset as a
  *                                   named source impression
  *   sources <warehouse>             list registered sources
  */
object Cli {
  def main(args: Array[String]): Unit = args.toList match {
    case "ingest" :: warehouse :: name :: path :: rest if rest.lengthIs <= 1 =>
      val spark = Sessions.local()
      try {
        val runner = new Runner(spark, Transforms.standard(), warehouse)
        val ref = runner.ingest(name, path, rest.headOption.getOrElse("parquet"))
        println(s"ingested '${ref.name}' impression=${ref.impression} schema=${ref.schemaDDL}")
      } finally spark.stop()

    case "sources" :: warehouse :: Nil =>
      val spark = Sessions.local()
      try new Runner(spark, Transforms.standard(), warehouse).sources
        .foreach(r => println(s"${r.name}\t${r.impression}\t${r.format}\t${r.path}"))
      finally spark.stop()

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
        if rest.lengthIs <= 2 && rest.headOption.forall(_.forall(_.isDigit)) =>
      val port = rest.headOption.map(_.toInt).getOrElse(3315)
      // loopback unless explicitly exposed: serve <wh> [port] [bindHost]
      val host = rest.drop(1).headOption.getOrElse("127.0.0.1")
      val spark = Sessions.local()
      val runner = new Runner(spark, Transforms.standard(), warehouse)
      val api = new HttpApi(runner, port,
        Some(s => new Runner(s, Transforms.standard(), warehouse)),
        bindHost = host).start()
      println(s"graft serving on $host:${api.boundPort} (warehouse: $warehouse)")
      Thread.currentThread().join() // serve until killed

    case _ =>
      System.err.println(
        """usage: graft.api.Cli run <spec.json> <warehouse>
          |       graft.api.Cli serve <warehouse> [port] [bindHost]
          |       graft.api.Cli ingest <warehouse> <name> <path> [format]
          |       graft.api.Cli sources <warehouse>""".stripMargin)
      sys.exit(2)
  }
}
