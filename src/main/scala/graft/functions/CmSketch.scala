package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.apache.spark.util.sketch.CountMinSketch

/** Probe side of the Count-Min sketch aggregate (g15): point estimates
  * out of the serialized sketch `count_min_sketch(...)` produces.
  *
  * A UDF (not a codegen'd Expression) is the right tool here: estimates
  * are read on the PROBE side only — groups × probe-words rows, metadata
  * scale — while the corpus-scale work (building the sketch) runs through
  * Spark's native partial-aggregating `count_min_sketch`. Deserializing
  * the few-KB sketch once per probe row is noise next to the scan.
  */
object CmSketch {
  private val est = udf { (bytes: Array[Byte], word: String) =>
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      .estimateCount(word)
  }

  /** `estimate(sketchBytes, word)` — the CM point-frequency estimate. */
  def estimate(sketch: Column, word: Column): Column = est(sketch, word)
}
