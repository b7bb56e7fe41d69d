package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoders}
import graft.core.Tables

/** Multimodal-column operators (SURVEY.md §2 L9 + north-star "multimodal
  * columns"): opaque binary payloads with typed metadata, flowing through
  * sinks/scans unchanged, plus a batched feature-extraction stage.
  *
  * The decode step is a clearly-marked deterministic STUB (image/audio
  * codecs aren't in this container); everything around it — schema
  * (binary + metadata struct), partition-preserving batched execution via
  * `mapPartitions`, sink round-trip — is real and tested. Swapping the stub
  * for a JNI/codec call changes one function body, not the plan.
  */
object MultiModal {
  import Relational.Q

  /** Typed row for the feature-extraction stage. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], fmt: String, width: Long)
  case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Int,
                           head_sum: Int, payload_md5: String)

  /** STUB decoder: deterministic fake "features" from the raw bytes —
    * length, a head checksum (stands in for decoded-pixel stats), and a
    * content digest. Replace with a real codec at deployment. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val head = r.payload.take(16)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.payload).map("%02x".format(_)).mkString
    MediaFeatures(r.doc_id, r.fmt, r.payload.length,
      head.foldLeft(0)((a, b) => a + (b & 0xff)) % 256, hex)
  }

  /** L9a: binary column + metadata struct survive a parquet sink round-trip
    * byte-for-byte (verified via content digest vs the oracle).
    *
    * Oracle caveat: Spark measures the UTF-8 payload in BYTES while the
    * DuckDB twin measures the text in CHARACTERS — equal only because the
    * fixture corpus is ASCII. Real multimodal payloads are opaque binary
    * (no text twin exists), so the byte-side measurements here are the
    * correct engine behavior; only the oracle encoding is ASCII-bound. */
  val mm1BinaryRoundtrip: Q = (s, d) => {
    val out = graft.core.TempDirs.scratchSlot("mm").toString
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(lit("txt").as("fmt"), col("n_chars").as("width")).as("meta"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out).select(
      col("doc_id"),
      md5(col("payload")).as("payload_md5"),
      length(col("payload")).as("n_bytes"),
      col("meta.fmt").as("fmt"),
      col("meta.width").as("width"))
  }

  /** L9b: batched feature extraction over binary payloads via mapPartitions
    * (the Scala analogue of a vectorized pandas-UDF stage): one decoder
    * instance per partition, streaming through rows. */
  val mm2FeatureExtract: Q = (s, d) => {
    val media = Tables.documents(s, d)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("txt").as("fmt"),
        col("n_chars").as("width"))
      .as(Encoders.product[MediaRow])
    media.mapPartitions { it =>
      // per-partition setup (real decoders are expensive to init — this is
      // where a codec/model handle would be created once per partition)
      it.map(decodeStub)
    }(Encoders.product[MediaFeatures]).toDF()
  }

  /** L9c: frame sampling over an opaque binary payload — the video/audio
    * "sample every k-th frame" shape on the Spark side: fixed-stride
    * substrings of the binary column exploded to one row per frame, each
    * digested. The plan is scan → generate → project (no shuffle); a real
    * container format swaps the stride arithmetic for codec frame offsets
    * inside the same generate. Oracle-checked: the fixture payload is
    * UTF-8 text, so DuckDB reproduces frames with substring on the text. */
  val mm3FrameSample: Q = (s, d) => {
    val frameLen = 32
    val stride = 100
    val media = Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
    media
      .select(col("doc_id"), length(col("payload")).as("n_bytes"),
        // greatest(0, ...): an empty payload must yield an empty (not
        // DESCENDING) sequence — spark's sequence(0, -1) counts down
        posexplode(expr(
          s"transform(sequence(0, greatest(0, int(floor((length(payload) - 1) / $stride)))), " +
          s"i -> substring(payload, i * $stride + 1, $frameLen))"))
          .as(Seq("frame_idx", "frame")))
      .where(length(col("frame")) === frameLen) // drop ragged tail frames
      .select(col("doc_id"), col("frame_idx"),
        md5(col("frame")).as("frame_md5"),
        length(col("frame")).as("frame_bytes"))
  }

  /** S11: BINARY-FILE source ingest roundtrip (VERDICT r6 #3) — the
    * rawdata half of the multimodal family: a directory of OPAQUE files
    * (one text file per source here; images/audio in production) read
    * back through Spark's `binaryFile` source, which yields
    * (path, modificationTime, length, content) per file — the same frame
    * the pipeline's `/ingest` format=binary registration serves
    * (`pipeline/Runner.readSource`, ref `upload.py:21-34`).
    *
    * The summary aggregates (source, ext, n_files, total_bytes,
    * content_bytes): `total_bytes` from file METADATA, `content_bytes`
    * from the fully-read payload — equal iff every byte of every file was
    * actually delivered. The oracle recomputes both from the raw table
    * (one '\n'-terminated line per doc; ASCII fixture, same caveat as
    * mm1), so a dropped file, a truncated read, or a partition-layout
    * change fails the hash compare.
    *
    * Scale shape: `binaryFile` lists and reads files in parallel per
    * partition (maxPartitionBytes-bounded); the aggregate is one shuffle
    * on (source, ext). Whole-file rows mean one row per object — the
    * right unit for opaque media; frame/chunk explosion happens
    * downstream (mm3). */
  val s11BinaryIngest: Q = (s, d) => {
    val out = graft.core.TempDirs.scratchSlot("binsrc").toString
    Tables.documents(s, d).select(col("source"), col("text"))
      .repartition(col("source"))
      .write.mode("overwrite").partitionBy("source").text(out)
    s.read.format("binaryFile")
      .option("pathGlobFilter", "part-*")
      .option("recursiveFileLookup", "true")
      .load(out)
      .select(
        regexp_extract(col("path"), "source=([^/]+)", 1).as("source"),
        regexp_extract(col("path"), "\\.([a-z0-9]+)$", 1).as("ext"),
        col("length"), col("content"))
      .groupBy(col("source"), col("ext"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("length")).as("total_bytes"),
        sum(length(col("content")).cast("long")).as("content_bytes"))
  }

  /** MM4: frame-fingerprint near-dup — the media analogue of L5's
    * shingle dedup: two payloads sharing many identical FRAMES (mm3's
    * fixed-stride substrings; codec frame offsets in production) are
    * duplicate candidates even when their containers differ. The plan is
    * the same inverted-index shape as L5 — candidates block on the frame
    * digest, only (doc_id, md5) rows travel, never payload×payload — with
    * a document-frequency cap dropping boilerplate frames (intros, color
    * bars, silence) that appear in more than `dfCap` docs, which is what
    * bounds every join bucket at dfCap² regardless of how common a frame
    * is at 100 TB. Pairs sharing ≥ `minShared` distinct frames emit with
    * the shared count (all-integer row identity). */
  /** mm4 core over ANY (doc_id, payload: binary) frame. Exposed to the
    * registry as `frame_dup`. */
  private[graft] def frameDupFrames(media: DataFrame, frameLen: Int,
      stride: Int, dfCap: Long, minShared: Long): DataFrame = {
    val frames = media
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, greatest(0, int(floor((length(payload) - 1) / $stride)))), " +
        s"i -> substring(payload, i * $stride + 1, $frameLen))")).as("frame"))
      .where(length(col("frame")) === frameLen)
      .select(col("doc_id"), md5(col("frame")).as("fh"))
      .distinct()
    val rare = frames.groupBy(col("fh"))
      .agg(count(lit(1)).as("df")).where(col("df") <= dfCap)
      .select(col("fh"))
    val pruned = frames.join(rare, Seq("fh"), "left_semi")
    pruned.select(col("fh"), col("doc_id").as("da"))
      .join(pruned.select(col("fh"), col("doc_id").as("db")), Seq("fh"))
      .where(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  val mm4FrameDup: Q = (s, d) =>
    frameDupFrames(
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
      frameLen = 32, stride = 100, dfCap = 64L, minShared = 3L)

  val queries: Map[String, Q] = Map(
    "mm1_binary_roundtrip" -> mm1BinaryRoundtrip,
    "mm4_frame_dup" -> mm4FrameDup,
    "mm2_feature_extract" -> mm2FeatureExtract,
    "mm3_frame_sample" -> mm3FrameSample,
    "s11_binary_ingest" -> s11BinaryIngest
  )

  val oracle: Map[String, String] = Map(
    // frames re-derived with the same stride/length arithmetic as mm3's
    // oracle (ASCII fixture caveat, see mm1); df cap and shared-count
    // threshold mirrored exactly
    "mm4_frame_dup" ->
      """WITH fr AS (
           SELECT DISTINCT doc_id,
                  md5(substring(text, i * 100 + 1, 32)) AS fh
           FROM (SELECT doc_id, text,
                        unnest(range(greatest(0, CAST(floor((length(text) - 1) / 100) AS BIGINT)) + 1)) AS i
                 FROM documents)
           WHERE length(substring(text, i * 100 + 1, 32)) = 32),
         rare AS (SELECT fh FROM fr GROUP BY fh HAVING count(*) <= 64),
         pr AS (SELECT fr.doc_id, fr.fh FROM fr JOIN rare USING (fh))
         SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_shared
         FROM pr a JOIN pr b ON a.fh = b.fh AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 3""",
    // n_files = 1 per source BY CONSTRUCTION: repartition(source) puts a
    // source's rows in exactly one task, partitionBy splits per source —
    // so the oracle may assert the literal (a layout regression to
    // many-files-per-source fails the compare). bytes = Σ(len + 1): the
    // text sink '\n'-terminates every row; ASCII fixture (mm1 caveat).
    "s11_binary_ingest" ->
      """SELECT source, 'txt' AS ext, CAST(1 AS BIGINT) AS n_files,
                CAST(sum(length(text) + 1) AS BIGINT) AS total_bytes,
                CAST(sum(length(text) + 1) AS BIGINT) AS content_bytes
         FROM documents GROUP BY source""",
    "mm1_binary_roundtrip" ->
      """SELECT doc_id, md5(text) AS payload_md5, length(text) AS n_bytes,
                'txt' AS fmt, n_chars AS width
         FROM documents""",
    "mm3_frame_sample" ->
      """SELECT doc_id, i AS frame_idx,
                md5(substring(text, i * 100 + 1, 32)) AS frame_md5,
                CAST(32 AS INT) AS frame_bytes
         FROM (SELECT doc_id, text,
                      unnest(range(greatest(0, CAST(floor((length(text) - 1) / 100) AS BIGINT)) + 1)) AS i
               FROM documents)
         WHERE length(substring(text, i * 100 + 1, 32)) = 32""",
    "mm2_feature_extract" ->
      """SELECT doc_id, 'txt' AS fmt, CAST(length(text) AS INT) AS n_bytes,
                CAST(coalesce((SELECT sum(ascii(substring(text, i + 1, 1)))
                 FROM (SELECT unnest(range(least(length(text), 16))) AS i)), 0) % 256 AS INT) AS head_sum,
                md5(text) AS payload_md5
         FROM documents"""
  )
}
