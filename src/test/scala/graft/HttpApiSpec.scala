package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.api.HttpApi
import graft.pipeline.{Runner, Transforms}

/** End-to-end over the HTTP facade: submit a pipeline, poll status to
  * completion, collect the output manifest, purge — the reference server's
  * observable loop (execute → status → collect) on the Spark runner. */
class HttpApiSpec extends SparkSpec {
  private lazy val client = HttpClient.newHttpClient()

  private def get(url: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def post(url: String, body: String = ""): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("malformed specs are parse errors, not silent no-ops") {
    // missing/typo'd steps key
    assertThrows[RuntimeException](graft.api.SpecJson.parse("""{"Steps": []}"""))
    // empty steps
    assertThrows[RuntimeException](graft.api.SpecJson.parse("""{"steps": []}"""))
    // wrong-shaped inputs (array instead of object)
    assertThrows[Exception](graft.api.SpecJson.parse(
      """{"steps": [{"id": "a", "transform": "identity",
                     "inputs": [["x", "b"]]}]}"""))
  }

  test("cycle outside the requested roots errors cleanly, not StackOverflow") {
    import graft.pipeline.{PipelineSpec, StepSpec}
    val spec = PipelineSpec(Seq(
      StepSpec("a", "identity", Map("x" -> "b")),
      StepSpec("b", "identity", Map("x" -> "a")),
      StepSpec("c", "source", params = Map("dir" -> sfDir, "table" -> "region"))))
    val e = intercept[IllegalArgumentException](spec.impressionIds)
    assert(e.getMessage.contains("cycle"))
  }

  test("spec without explicit roots defaults to all steps") {
    // regression: json4s extracts a missing field to an EMPTY Seq, which
    // silently executed nothing
    val (spec, roots) = graft.api.SpecJson.parse(
      """{"steps": [{"id": "a", "transform": "source",
                     "params": {"dir": "x", "table": "y"}}]}""")
    assert(roots == Seq("a") && spec.steps.map(_.id) == Seq("a"))
  }

  test("concurrent runs with a shared step name keep independent statuses") {
    val wh = Files.createTempDirectory("graft_api_wh2").toString
    val api = new HttpApi(new Runner(spark, Transforms.standard(), wh)).start()
    val base = s"http://localhost:${api.boundPort}"
    try {
      def spec(table: String) = s"""{
        "steps": [{"id": "load", "transform": "source",
                   "params": {"dir": "$sfDir", "table": "$table"}}]}"""
      // submit two runs back-to-back; both specs name their step "load"
      val ids = Seq("region", "nation").map { t =>
        "\"run_id\"\\s*:\\s*\"([^\"]+)\"".r
          .findFirstMatchIn(post(s"$base/run", spec(t))._2).get.group(1)
      }
      val deadline = System.currentTimeMillis() + 60000
      def done(id: String) = get(s"$base/status/$id")._2.contains("\"workflow\":\"finished\"")
      while (!ids.forall(done) && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      ids.foreach { id =>
        val body = get(s"$base/status/$id")._2
        assert(body.contains("\"load\":\"finished\""), s"run $id: $body")
      }
      // distinct impressions, both collectable
      val rows = ids.map(id =>
        "\"rows\"\\s*:\\s*(\\d+)".r
          .findFirstMatchIn(get(s"$base/collect/$id/load")._2).get.group(1).toLong)
      assert(rows == Seq(5L, 25L), s"got $rows")
    } finally api.stop()
  }

  test("ping / run / status / collect / purge round-trip") {
    val wh = Files.createTempDirectory("graft_api_wh").toString
    val api = new HttpApi(new Runner(spark, Transforms.standard(), wh)).start()
    val base = s"http://localhost:${api.boundPort}"
    try {
      assert(get(s"$base/ping")._2.contains("Connected"))

      val spec = s"""{
        "steps": [
          {"id": "src", "transform": "source",
           "params": {"dir": "$sfDir", "table": "nation"}},
          {"id": "agg", "transform": "sql", "inputs": {"t": "src"},
           "params": {"sql": "SELECT n_regionkey, count(*) AS n FROM t GROUP BY 1"}}
        ],
        "roots": ["agg"]
      }"""
      val (code, runBody) = post(s"$base/run", spec)
      assert(code == 202, runBody)
      val runId = "\"run_id\"\\s*:\\s*\"([^\"]+)\"".r
        .findFirstMatchIn(runBody).get.group(1)

      var status = ""
      val deadline = System.currentTimeMillis() + 60000
      while (status != "finished" && System.currentTimeMillis() < deadline) {
        status = "\"workflow\"\\s*:\\s*\"([^\"]+)\"".r
          .findFirstMatchIn(get(s"$base/status/$runId")._2).get.group(1)
        if (status == "failed") fail(s"pipeline failed: ${get(s"$base/status/$runId")._2}")
        Thread.sleep(100)
      }
      assert(status == "finished")
      assert(get(s"$base/status/$runId")._2.contains("\"agg\":\"finished\""))

      val (cc, collectBody) = get(s"$base/collect/$runId/agg")
      assert(cc == 200 && collectBody.contains("\"rows\":5"), collectBody)

      // unknown step id must 404, not drop the connection
      assert(get(s"$base/collect/$runId/typo")._1 == 404)
      assert(post(s"$base/purge/$runId/typo")._1 == 404)

      assert(post(s"$base/purge/$runId/agg")._1 == 200)
      assert(get(s"$base/collect/$runId/agg")._1 == 404)

      // purge resets the sticky terminal status, so a re-run recomputes
      val (c2, runBody2) = post(s"$base/run", spec)
      assert(c2 == 202, runBody2)
      val runId2 = "\"run_id\"\\s*:\\s*\"([^\"]+)\"".r
        .findFirstMatchIn(runBody2).get.group(1)
      var st2 = ""
      val dl2 = System.currentTimeMillis() + 60000
      while (st2 != "finished" && System.currentTimeMillis() < dl2) {
        st2 = "\"workflow\"\\s*:\\s*\"([^\"]+)\"".r
          .findFirstMatchIn(get(s"$base/status/$runId2")._2).get.group(1)
        if (st2 == "failed") fail("re-run after purge failed")
        Thread.sleep(100)
      }
      assert(get(s"$base/collect/$runId2/agg")._2.contains("\"rows\":5"))

      assert(get(s"$base/status/nope")._1 == 404)
      assert(post(s"$base/run", "{bad json")._1 == 400)
    } finally api.stop()
  }
}
