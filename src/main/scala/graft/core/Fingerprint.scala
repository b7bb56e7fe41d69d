package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Metadata-cost content fingerprint of a file tree: relative names, sizes
  * and mtimes, digested. Changing, adding, touching or removing any file
  * under the path changes the fingerprint — without reading a byte of
  * data, so it stays cheap when the tree is 100 TB of parquet (one file
  * listing, the same metadata a scan's planning already enumerates).
  *
  * This is the invalidation key for every per-source-dir derived cache
  * (trained IVF centroids, bucketed join tables, ingest impressions): a
  * dataset mutated IN PLACE mints a new fingerprint, so stale trained or
  * bucketed state can't be served for the JVM lifetime. */
object Fingerprint {
  def of(path: String): String = of(Paths.get(path))

  def of(p: Path): String = {
    if (!Files.exists(p)) return "absent"
    val walk = Files.walk(p)
    try {
      val entries = walk.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(f => s"${p.relativize(f)}:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}")
        .toSeq.sorted
      sha16(entries.mkString("\n"))
    } finally walk.close()
  }

  private def sha16(payload: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes(StandardCharsets.UTF_8))
      .take(16).map("%02x".format(_)).mkString
}
