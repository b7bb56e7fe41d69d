package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** The fixture corpus contains no PII, so the declared l18 query only
  * hash-checks the zero-count path — this spec injects real-shaped PII
  * and proves the redaction semantics: counts, untouched text, and the
  * email-before-IP replacement order both engines apply. */
class PiiScrubSpec extends SparkSpec {

  test("l18 core: counts and redaction on injected PII rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact alice.smith+dev@example.co.uk or bob@test.io today"),
      (2L, "server at 10.0.0.1 and backup at 192.168.255.254 down"),
      (3L, "mixed admin@host.org from 127.0.0.1 twice from 127.0.0.1"),
      (4L, "clean text with no sensitive tokens at all"),
      (5L, "not-an-ip 999.999.999.999 is still matched by the liberal pattern"))
      .toDF("doc_id", "text")
    val out = TextOps.piiScrub(rows).orderBy(col("doc_id")).collect()

    assert(out(0).getAs[Int]("n_emails") == 2)
    assert(out(0).getAs[Int]("n_ipv4") == 0)
    assert(out(1).getAs[Int]("n_emails") == 0)
    assert(out(1).getAs[Int]("n_ipv4") == 2)
    assert(out(2).getAs[Int]("n_emails") == 1)
    assert(out(2).getAs[Int]("n_ipv4") == 2)
    assert(out(3).getAs[Int]("n_emails") == 0 && out(3).getAs[Int]("n_ipv4") == 0)
    // liberal \d{1,3} octets by design (redaction favors recall)
    assert(out(4).getAs[Int]("n_ipv4") == 1)

    // clean_len reflects actual replacement: recompute doc 3 by hand
    val expected3 = "mixed <EMAIL> from <IP> twice from <IP>".length
    assert(out(2).getAs[Int]("clean_len") == expected3)
    // untouched doc keeps its length
    assert(out(3).getAs[Int]("clean_len") == rows.where($"doc_id" === 4L)
      .head().getString(1).length)
  }

  test("l18 declared query runs on the fixture and is all-zero counts") {
    val df = TextOps.l18PiiScrub(spark, sfDir)
    val n = df.count()
    assert(n > 0)
    // synthetic corpus has no PII: any nonzero count means the pattern
    // went over-liberal on plain words — a silent redaction regression
    assert(df.where(col("n_emails") > 0 || col("n_ipv4") > 0).count() == 0)
  }
}
