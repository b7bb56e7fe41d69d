package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.TextOps

/** The shingle join-key width flag (VERDICT r17 #4): the documented
  * "widen to 128-bit at 100 TB" swap must be a parameter of the l5-family
  * registry transforms, not a rewrite. Width is a pure re-keying — absent
  * collisions (none at fixture scale for either width) every result is
  * IDENTICAL, because all these operators consume only hash equality. */
class ShingleHashWidthSpec extends SparkSpec {

  private def docs = Tables.documentsWide(spark, sfDir)

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toIndexedSeq
  }

  test("shingleKey: 64-bit is a long, 128-bit is a 16-byte binary, others rejected") {
    val d = docs.select(col("doc_id"),
      TextOps.shingleKey(col("text"), 64).as("h64"),
      TextOps.shingleKey(col("text"), 128).as("h128"))
    assert(d.schema("h64").dataType == org.apache.spark.sql.types.LongType)
    assert(d.schema("h128").dataType == org.apache.spark.sql.types.BinaryType)
    assert(d.select(max(length(col("h128")))).head.getInt(0) == 16)
    intercept[IllegalArgumentException] { TextOps.shingleKey(col("text"), 96) }
  }

  test("decontaminate: the 128-bit path matches the 64-bit path row-for-row") {
    val train = docs.where(col("doc_id") % 20 =!= 0)
    val eval = docs.where(col("doc_id") % 20 === 0)
    val w64 = TextOps.decontaminateFrames(train, eval, n = 3)
    val w128 = TextOps.decontaminateFrames(train, eval, n = 3, hashBits = 128)
    assert(sortedRows(w64) == sortedRows(w128))
    assert(w64.count() > 0)
  }

  test("containment dedup: the 128-bit path keeps exactly the 64-bit survivors") {
    val w64 = TextOps.containmentDedupFrames(docs, n = 3, tau = 0.6)
      .select(col("doc_id"))
    val w128 = TextOps.containmentDedupFrames(docs, n = 3, tau = 0.6, hashBits = 128)
      .select(col("doc_id"))
    assert(sortedRows(w64) == sortedRows(w128))
  }

  test("novelty: the 128-bit path scores every doc identically") {
    val w64 = TextOps.noveltyFrames(docs, n = 3)
    val w128 = TextOps.noveltyFrames(docs, n = 3, hashBits = 128)
    assert(sortedRows(w64) == sortedRows(w128))
  }

  test("registry transforms accept hash_bits=128") {
    val reg = graft.pipeline.Transforms.standard()
    val out = reg.resolve("novelty")(spark, Map("docs" -> docs),
      graft.pipeline.ParamMap(Map("n" -> "3", "hash_bits" -> "128")))
    assert(out.count() == docs.count())
  }
}
