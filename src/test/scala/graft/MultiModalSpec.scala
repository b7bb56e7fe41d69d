package graft

import org.apache.spark.sql.functions._

/** Enforces the mm1/mm3 oracle contract: Spark slices/measures the UTF-8
  * payload in BYTES while the DuckDB twin slices the text in CHARACTERS
  * (this DuckDB has no md5(BLOB), so a byte-based twin is not
  * expressible). The two agree exactly when — and only when — the fixture
  * corpus is pure ASCII. This spec turns that documented assumption into a
  * loud failure: if the driver ever regenerates `documents` with any
  * multi-byte character, these tests fail instead of the oracle silently
  * hash-mismatching on frames/lengths/digests. */
class MultiModalSpec extends SparkSpec {
  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")) {
    test(s"mm oracle ASCII contract holds for $dir") {
      val nonAscii = graft.core.Tables.documents(spark, dir)
        .where(length(encode(col("text"), "UTF-8")) =!= length(col("text")))
        .count()
      assert(nonAscii == 0L,
        s"$nonAscii docs in $dir contain multi-byte characters — the mm1/mm3 " +
          "byte-sliced results no longer match their character-sliced DuckDB " +
          "oracles; wrap the oracles in character-safe twins or re-derive them")
    }
  }
}
