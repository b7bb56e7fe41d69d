package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Vector similarity operators (SURVEY.md §2 B9 L6-L7) over `embeddings`.
  *
  * Dot products are computed with built-in higher-order functions
  * (`zip_with` + `aggregate`) in double precision, left-to-right — the same
  * order DuckDB's unnest-zip sum uses, so values are bit-identical and
  * hash-verifiable. No UDF: the whole pipeline stays in codegen.
  *
  * Scale path: the brute-force pair join is blocked on `label` (an IVF-style
  * coarse quantizer cell). At 100 TB you'd keep exactly this plan shape and
  * only swap the blocking key for a learned centroid id — the join stays a
  * shuffle on the block key with per-block pair generation, never a global
  * cross join. l7b adds the LSH-bucketed variant (random-hyperplane signs).
  */
object VectorOps {
  import Relational.Q

  /** Coarse-quantizer hyperparameters SHARED by l7c (IVF) and l7f (IVFADC):
    * both train through [[cachedByFingerprint]] on [[centroidCache]], keyed
    * only by source dir — correctness of that share requires both ops to
    * train with identical (K, iters), so the constants live here, once
    * (ADVICE r6: duplicated literals would silently serve wrong-shaped
    * centroids to whichever op trained second). */
  private[graft] val IvfK = 16
  private[graft] val IvfIters = 3

  /** Σ aᵢ·bᵢ in double, sequential — matches the oracle's summation order.
    * Backed by the codegen'd [[graft.functions.VecDot]] expression (callers
    * register it per session); the interpreted higher-order-function
    * formulation `aggregate(zip_with(a,b,*),0d,+)` computes the identical
    * value but ~3× slower (closure per element + intermediate array). */
  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def withNorm(df: DataFrame, suffix: String): DataFrame =
    df.select(
      col("vec_id").as(s"id$suffix"),
      col("label"),
      col("cell"),
      col("embedding").as(s"v$suffix"),
      norm(col("embedding")).as(s"n$suffix"))

  /** Deterministic pseudo-random hyperplane p: h_p[i] = sin(p·7919 +
    * i·104729) — fixed and reproducible without a model artifact; the prime
    * strides decorrelate planes. Shared by the LSH table path (l7b) and the
    * hot-label sub-blocking (l6c/l7e). */
  private[graft] def hyperplane(p: Int, dim: Int = 64): Array[Double] =
    Array.tabulate(dim)(i => math.sin((p * 7919 + i * 104729).toDouble))

  /** Hyperplane count for a label of size `cnt` under block cap `cap`:
    * 0 for labels at or under the cap (one exact block), else enough sign
    * bits that the expected cell size is ≤ cap, bounded by maxBits. Shared
    * by the sub-blocking router and the capped summaries' expectation
    * floors, so the declared contract can never drift from the routing. */
  private val maxBits = 12
  private[graft] def bitsFor(cnt: Column, cap: Long): Column =
    when(cnt <= cap, lit(0)).otherwise(least(lit(maxBits),
      ceil(log(2.0, cnt.cast("double") / cap)).cast("int")))

  /** Hot-label sub-blocking for the "exact" pair operators (the l5
    * df-cap's vector analogue): a label whose block exceeds `cap` makes
    * the within-label pair join quadratic in that block on a skewed label
    * distribution. Labels at or under the cap keep `cell = -1` — ONE
    * block, exact semantics. Oversized labels are split by the sign bits
    * of `ceil(log2(cnt/cap))` fixed random hyperplanes (expected cell size
    * ≤ cap), and only same-cell pairs are compared — approximate for hot
    * labels, by the LSH guarantee that keeps high-cosine pairs colliding
    * with high probability (the regime dedup/kNN consumers care about).
    *
    * Scale shape: one count aggregation on `label` (the key the pair join
    * shuffles on anyway), broadcast back (#labels rows); the signature is
    * maxBits codegen'd vec_dots per row, computed only where a plan needs
    * them. No new shuffle, and every join bucket is bounded ~cap². */
  private[graft] def subBlockedByLabel(e: DataFrame, cap: Long): DataFrame =
    subBlockedBy(e, "label", cap, "cell")

  /** The same cap generalized over ANY blocking key (r19 — l36's learned
    * k-means cells need it too): blocks at or under `cap` get `out` = -1
    * (one block, exact), oversized blocks split by hyperplane sign bits. */
  private[graft] def subBlockedBy(e: DataFrame, key: String, cap: Long,
      out: String): DataFrame = {
    graft.functions.VecDot.register(e.sparkSession)
    val sig = (0 until maxBits).map { b =>
      when(dot(col("embedding"), typedLit(hyperplane(1000 + b))) > 0,
        shiftleft(lit(1), b)).otherwise(lit(0))
    }.reduce((a: Column, c: Column) => a.bitwiseOR(c))
    val counts = e.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .withColumn("bits", bitsFor(col("cnt"), cap))
    e.join(broadcast(counts), Seq(key))
      .withColumn(out,
        when(col("cnt") <= cap, lit(-1))
          .otherwise(sig.bitwiseAND(expr("shiftleft(1, bits) - 1"))))
      .drop("cnt", "bits")
  }

  /** l6 core over an arbitrary (vec_id, label, embedding) frame; `cap`
    * engages hot-label sub-blocking (None = exact within-label). */
  private[graft] def cosinePairsOn(e0: DataFrame, cap: Option[Long]): DataFrame = {
    graft.functions.VecDot.register(e0.sparkSession)
    val e = cap.fold(e0.withColumn("cell", lit(-1)))(c => subBlockedByLabel(e0, c))
    withNorm(e, "a").join(withNorm(e, "b"), Seq("label", "cell"))
      .where(col("ida") < col("idb"))
      .select(col("label"), col("ida"), col("idb"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
      .where(col("cos") > 0.2)
  }

  /** L6: pairwise cosine similarity within label blocks (exact). */
  val l6CosinePairs: Q = (s, d) => cosinePairsOn(Tables.embeddings(s, d), None)

  /** L6c: l6 with the hot-label block cap engaged (VERDICT r5 #5) — the
    * skew-safe production variant. cap = 48 splits every oversized label
    * at every sf, so the routing is exercised end-to-end. Declared as a
    * [[cappedPairsSummary]] property query (subset + in-plan
    * expectation-floor retention); skew bounds asserted in ScalaTest. */
  val l6cCosinePairsCapped: Q = (s, d) =>
    cosinePairsOn(Tables.embeddings(s, d), Some(blockCap))

  /** L6b: embedding-cosine near-dup DEDUP — semantic duplicate groups:
    * connected components ([[Graphs.connectedComponents]], shared with the
    * shingle path l5e) over the cosine-similarity pair graph, one
    * canonical vector per group. The θ here is calibrated to the fixture
    * distribution (random-ish synthetic embeddings have no 0.95-cosine
    * twins); a production semantic-dedup run sets θ ≈ 0.95 on real
    * embeddings — the plan is identical, only the literal changes. */
  val l6bEmbedDedup: Q = (s, d) =>
    embedDedupFrames(Tables.embeddings(s, d), theta = 0.35)

  /** l6b core over an arbitrary (vec_id, label, embedding) frame with the
    * similarity threshold exposed: the declared query's θ = 0.35 is
    * fixture-calibrated (synthetic embeddings have no 0.95-cosine twins);
    * a production semantic-dedup run passes its own θ (typically ≈ 0.95)
    * through the pipeline registry's `embed_dedup` transform — same plan,
    * different literal. */
  private[graft] def embedDedupFrames(emb: DataFrame, theta: Double): DataFrame = {
    val pairs = cosinePairsOn(emb, None).where(col("cos") >= theta)
      .select(col("ida").as("da"), col("idb").as("db"))
    val ids = emb.select(col("vec_id").as("id"))
    Graphs.connectedComponents(ids, pairs)
      .select(col("id").as("vec_id"), col("component"),
        (col("id") === col("component")).cast("boolean").as("is_canonical"))
  }

  /** l7 core over an arbitrary (vec_id, label, embedding) frame; `cap`
    * engages hot-label sub-blocking (None = exact within-label). */
  private[graft] def knnBruteOn(e0: DataFrame, cap: Option[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecDot.register(e0.sparkSession)
    val e = cap.fold(e0.withColumn("cell", lit(-1)))(c => subBlockedByLabel(e0, c))
    val pairs = withNorm(e, "a").join(withNorm(e, "b"), Seq("label", "cell"))
      .where(col("ida") =!= col("idb"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
    val w = Window.partitionBy(col("ida")).orderBy(col("cos").desc, col("idb"))
    pairs
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("ida"), col("idb"), col("rk"), round(col("cos"), 6).as("cos"))
  }

  /** L7: top-3 nearest neighbors per vector (brute force within label,
    * ranked by unrounded cosine with id tiebreak). */
  val l7KnnBruteForce: Q = (s, d) => knnBruteOn(Tables.embeddings(s, d), None)

  /** L7e: l7 brute with the hot-label block cap engaged (VERDICT r5 #5).
    * Same cap/blocking as l6c; neighbors come from same-cell candidates.
    * Declared as a [[cappedKnnSummary]] property query (in-plan
    * expectation-floor recall); candidate-subset + per-fixture recall
    * floor in ScalaTest. */
  val l7eKnnBruteCapped: Q = (s, d) =>
    knnBruteOn(Tables.embeddings(s, d), Some(blockCap))

  /** L7b: ANN via random-hyperplane LSH — 6 independent hash tables of 6
    * sign bits each (36 fixed pseudo-random hyperplanes); a pair is a
    * candidate if it collides in ANY table (union → distinct). For a
    * neighbor at cos 0.6 the per-plane agreement is ~0.70, so one 6-bit
    * table catches ~0.12 of such pairs but six tables catch ~0.53 — the
    * table/bit trade dialed to clear the recall floor asserted in ScalaTest
    * while still pruning most of the O(n²) pair space. Candidates are then
    * exactly ranked. Declared rows-only for the driver. */
  val l7bKnnLsh: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecDot.register(s)
    val numTables = 6
    val bitsPerTable = 6
    val e = Tables.embeddings(s, d)
    // Planes ([[hyperplane]]) are LITERAL arrays computed once on the
    // driver, so the per-row work is one codegen'd vec_dot per plane.
    def planeDot(v: Column, p: Int): Column =
      dot(v, typedLit(hyperplane(p)))
    def bucket(tbl: Int): Column =
      (0 until bitsPerTable).map { b =>
        when(planeDot(col("embedding"), tbl * bitsPerTable + b) > 0,
          shiftleft(lit(1), b)).otherwise(lit(0))
      }.reduce((a: Column, c: Column) => a.bitwiseOR(c))
    // Candidate generation moves ONLY ids through the bucket join and the
    // union-of-tables dedup (the wide embedding arrays would dominate the
    // shuffle otherwise); vectors re-attach afterwards by unhinted id
    // joins — AQE broadcasts the payload side off runtime stats at
    // fixture scale and shuffles it at corpus scale (r17: a static
    // broadcast() hint would be honored at any size).
    //
    // The index is MATERIALIZED once (eager localCheckpoint): both sides of
    // the candidate self-join read it, and without the checkpoint each side
    // re-hashes every vector — 36 codegen'd vec_dots per row, twice. The
    // materialized rows are (id, label, tbl, bucket) — the LSH index you'd
    // build once at 100 TB too, a few dozen bytes per vector, never the
    // embedding arrays themselves.
    val bucketed = e.select(
      col("vec_id"), col("label"),
      posexplode(array((0 until numTables).map(bucket): _*)).as(Seq("tbl", "bucket")))
      .localCheckpoint(eager = true)
    val cand = bucketed.select(col("label"), col("tbl"), col("bucket"),
        col("vec_id").as("ida"))
      .join(bucketed.select(col("label"), col("tbl"), col("bucket"),
        col("vec_id").as("idb")), Seq("label", "tbl", "bucket"))
      .where(col("ida") =!= col("idb"))
      .select(col("ida"), col("idb")).distinct()
    val va = e.select(col("vec_id").as("ida"), col("embedding").as("va"),
      norm(col("embedding")).as("na"))
    val vb = e.select(col("vec_id").as("idb"), col("embedding").as("vb"),
      norm(col("embedding")).as("nb"))
    val w = Window.partitionBy(col("ida")).orderBy(col("cos").desc, col("idb"))
    cand.join(va, Seq("ida")).join(vb, Seq("idb"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("ida"), col("idb"), col("rk"), round(col("cos"), 6).as("cos"))
  }

  private def unitize(raw: Array[Double]): Option[Array[Double]] = {
    val n = math.sqrt(raw.map(x => x * x).sum)
    if (n > 0) Some(raw.map(_ / n)) else None
  }

  /** argmax-cosine cell id for `v` against literal unit centroids: K
    * codegen'd vec_dots per row, no shuffle (centroids ride along as
    * literals). Shared by the IVF (l7c) and IVFADC (l7f) paths so both
    * assign identically and can share one trained centroid set. */
  private def centroidCellOf(v: Column, nrm: Column,
      cents: Array[Array[Double]]): Column = {
    val ds = array(cents.toIndexedSeq.map(c => dot(v, typedLit(c)) / nrm): _*)
    (array_position(ds, array_max(ds)) - 1).cast("int")
  }

  /** Spherical k-means (Lloyd's) over unit vectors — the shared coarse
    * quantizer trainer for l7c/l7f. `base` needs (vec_id, `vcol`, nrm);
    * float and double vectors train bit-identically (exact widening).
    * Centroids are always driver-size (K × dim doubles — at 100 TB you
    * train on a SAMPLE, standard IVF practice). */
  private[graft] def trainIvfCentroids(base: DataFrame, vcol: String,
      K: Int, iters: Int): Array[Array[Double]] = {
    // deterministic init: the K lowest vec_ids unit-normalized (any
    // fixed spread works; Lloyd's moves them to the density in 2-3 steps)
    var cs = base.orderBy(col("vec_id")).limit(K)
      .select(col(vcol)).collect()
      .map { r =>
        val raw = r.getSeq[Number](0).map(_.doubleValue).toArray
        unitize(raw).getOrElse(raw) // all-zero vector: keep as-is
      }
    for (_ <- 1 to iters) {
      // element-wise mean of unit vectors per cell: explode to (cell, i,
      // x/nrm), avg, regroup on the driver — K·dim rows, metadata-scale
      val means = base.select(centroidCellOf(col(vcol), col("nrm"), cs).as("cell"),
          posexplode(col(vcol)).as(Seq("i", "x")), col("nrm"))
        .groupBy(col("cell"), col("i"))
        .agg(avg(col("x").cast("double") / col("nrm")).as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val byCell = means.groupBy(_._1)
      cs = cs.indices.map { c =>
        byCell.get(c)
          .flatMap(rows => unitize(rows.sortBy(_._2).map(_._3).toArray))
          .getOrElse(cs(c)) // empty cell keeps its centroid
      }.toArray
    }
    cs
  }

  /** Per-subspace Lloyd's for PQ codebooks — the shared trainer for
    * l7d (raw vectors) and l7f (IVF residuals). `frame` needs (vec_id,
    * `vcol`: array<double> of length M·subDim). ONE aggregation per
    * iteration trains all M subspaces: encode once (all M argmins in one
    * kernel call), unpack to (m, cell), explode the subvector elements,
    * mean per (m, cell, i) — M·Ksub·subDim rows, driver-scale. */
  private def trainPqBooks(frame: DataFrame, vcol: String, M: Int,
      subDim: Int, Ksub: Int, iters: Int): Array[Array[Array[Double]]] = {
    def cellFromCode(code: Column, m: Int): Column =
      shiftright(code, 4 * m).bitwiseAND(15)
    // deterministic init: subvectors of the Ksub lowest vec_ids
    val seedRows = frame.orderBy(col("vec_id")).limit(Ksub)
      .select(col(vcol)).collect()
      .map(_.getSeq[Double](0).toArray)
    var books = Array.tabulate(M, Ksub)((m, k) =>
      seedRows(k % seedRows.length).slice(m * subDim, m * subDim + subDim))
    for (_ <- 1 to iters) {
      val assigned = frame
        .select(col(vcol).as("v"),
          call_function("pq_encode", col(vcol), typedLit(books)).as("code"))
        .select(col("v"),
          posexplode(array((0 until M).map(m =>
            cellFromCode(col("code"), m).cast("int")): _*)).as(Seq("m", "cell")))
      val means = assigned.select(col("m"), col("cell"),
          posexplode(slice(col("v"), col("m") * subDim + 1, lit(subDim)))
            .as(Seq("i", "x")))
        .groupBy(col("m"), col("cell"), col("i"))
        .agg(avg(col("x")).as("mean"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
        .groupBy(_._1)
      books = Array.tabulate(M, Ksub)((m, k) =>
        means.get((m, k))
          .map(_.map(_._2).sortBy(_._1).map(_._2).toArray)
          .getOrElse(books(m)(k))) // empty cell keeps its centroid
    }
    books
  }

  /** L7c: ANN via IVF (inverted-file) with LEARNED centroids — the
    * production-shape coarse quantizer the l7 Scaladoc promises: k-means
    * (Lloyd's) over unit vectors, cells as blocking key, multi-probe on the
    * query side.
    *
    * Scale design: centroids are always driver-size (K × dim doubles —
    * at 100 TB you train on a SAMPLE, standard IVF practice) and ship to
    * executors as literal arrays, so assignment is K codegen'd vec_dot
    * calls per row, no shuffle. Index vectors land in exactly ONE cell;
    * each query probes its `nprobe` nearest cells, so the candidate join
    * is a shuffle on (label, cell) with per-cell pair generation — the
    * same bounded-bucket shape as l7b, but with data-adaptive buckets
    * (LSH buckets are oblivious; learned cells track the actual density).
    * Declared rows-only; recall vs l7 brute force asserted in ScalaTest. */
  val l7cKnnIvf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecDot.register(s)
    val K = IvfK; val iters = IvfIters; val nprobe = 2
    val e = Tables.embeddings(s, d)
    // Centroids are kept UNIT-norm (spherical k-means), so cosine ordering
    // needs only the scalar dot(raw, centroid)/|raw| — no per-element
    // vector normalization (a transform-divide lambda would re-evaluate
    // the norm per element: the HOF-CSE pitfall).
    // Materialized ONCE, eagerly: training collects (once per Lloyd
    // iteration), the probe/index sides, and the ranking re-attach all read
    // these blocks. Round 3 used persist() + an unpersist(blocking=false)
    // after plan CONSTRUCTION — which evicted the cache before the caller
    // ever executed the returned plan, so all four consumers recomputed the
    // scan+norm (driver bench 0.54→2.52 s). localCheckpoint lives outside
    // the CacheManager: the ContextCleaner reclaims the blocks when the
    // caller drops the DataFrame, same posture as Graphs.connectedComponents.
    val base = e.select(col("vec_id"), col("label"), col("embedding"),
      norm(col("embedding")).as("nrm")).localCheckpoint(eager = true)

    def dots(cents: Array[Array[Double]]): Column =
      array(cents.toIndexedSeq.map(c => dot(col("embedding"), typedLit(c)) / col("nrm")): _*)

    // Train once per (source dir, content fingerprint) — the IVF contract
    // is "train the quantizer once, probe many queries", so repeated
    // invocations (and the bench's min-of-2) measure the probe path, not
    // re-training (cachedByFingerprint). The cache is shared with l7f
    // (identical trainer, identical result from float or double vectors).
    val cents = cachedByFingerprint(centroidCache, d)(
      trainIvfCentroids(base, "embedding", K, iters))

    // index side: each vector in its single best cell; query side: probe
    // the nprobe nearest cells. Ids only through the join; vectors
    // re-attached by unhinted id joins for exact ranking (same shape as
    // l7b: runtime-stat broadcast when small, id shuffle at corpus scale).
    val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("dot").desc, col("cell"))
    val probes = base.select(col("vec_id"), col("label"),
        posexplode(dots(cents)).as(Seq("cell", "dot")))
      .withColumn("pk", row_number().over(wProbe))
    val queriesSide = probes.where(col("pk") <= nprobe)
      .select(col("label"), col("cell"), col("vec_id").as("ida"))
    val indexSide = probes.where(col("pk") === 1)
      .select(col("label"), col("cell"), col("vec_id").as("idb"))
    // SHUFFLE_HASH: both sides are the ×K posexploded probe table (window-
    // filtered, no aggregate), so the static size estimate is the
    // pre-explode lie (the l5 trap class) — at corpus scale the planner
    // would broadcast every vector's cell assignment. The candidate join
    // shuffles on (label, cell); per-cell build maps are cell-sized.
    val cand = queriesSide.join(indexSide.hint("shuffle_hash"),
        Seq("label", "cell"))
      .where(col("ida") =!= col("idb"))
      .select(col("ida"), col("idb")).distinct()
    val va = base.select(col("vec_id").as("ida"), col("embedding").as("va"),
      col("nrm").as("na"))
    val vb = base.select(col("vec_id").as("idb"), col("embedding").as("vb"),
      col("nrm").as("nb"))
    val w = Window.partitionBy(col("ida")).orderBy(col("cos").desc, col("idb"))
    cand.join(va, Seq("ida")).join(vb, Seq("idb"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("ida"), col("idb"), col("rk"), round(col("cos"), 6).as("cos"))
  }

  /** L7d: ANN via PRODUCT QUANTIZATION (ADC + exact re-rank) — the
    * memory-bounded
    * index for corpora whose raw vectors can't ride the candidate shuffle:
    * each 64-dim float vector is encoded as M=16 sub-codes of 4 bits (one
    * LONG per vector, 32× smaller than the embedding array), sub-codebooks
    * (16 × 16 × 4 doubles) are trained by per-subspace Lloyd's and ship as
    * LITERALS, and ranking is asymmetric distance computation: the query
    * computes one 256-entry dot table against the codebooks, and each
    * candidate's score is 16 table lookups — no index-side vector is ever
    * read after encoding. (16×4-dim quantizes measurably finer than
    * 8×8-dim at the same code budget: top-1-in-top-3 recall 0.65 vs 0.42
    * on the fixture.)
    *
    * Scale design: the label-blocked candidate join moves (label, id,
    * code:long, norm:double) ONLY — 16 bytes/vector in the shuffle vs 256
    * for raw float vectors — and the reconstruction-norm table is
    * data-independent (a literal). The QUERY side is the honest remaining
    * cost: each query row carries its 256-double ADC table (~2 KB) through
    * one re-attach join — fine because queries are a small set re-attached
    * once, while INDEX vectors are the 100 TB side and dominate the
    * candidate join's |queries|×|candidates| row volume, where only codes
    * travel. (The re-attach joins carry NO static broadcast hint — r17:
    * an explicit broadcast() is always honored, so a hinted corpus-scale
    * payload side would be forced onto the driver at any data size; with
    * the hint dropped, AQE broadcasts off runtime stats at fixture scale
    * and the join shuffles on the id at corpus scale — the mm4-validated
    * self-correcting shape.) The ADC
    * ordering prunes to a 12-candidate short list that exact cosine
    * re-ranks (ADC+R — see the inline note). Declared as an
    * [[annSummary]] property query; recall floor vs l7 brute asserted in
    * ScalaTest. */
  val l7dKnnPq: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecDot.register(s)
    graft.functions.PqExprs.register(s)
    val M = 16; val subDim = 4; val Ksub = 16; val iters = 3
    val e = Tables.embeddings(s, d)
    val base = e.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(eager = true)

    // PQ encode / ADC-table as compact codegen'd kernels
    // (functions/PqExprs.scala): the expression-tree formulation (M·Ksub
    // = 256 inlined sub-dot argmins per consumer) exceeded the JVM's
    // 64 KB method limit and silently fell back to interpreted eval on
    // the hottest stage. Same math, bit-identical scores/tie-breaks.
    def pqEncode(v: Column, books: Array[Array[Array[Double]]]): Column =
      call_function("pq_encode", v, typedLit(books))
    def pqAdcTable(v: Column, books: Array[Array[Array[Double]]]): Column =
      call_function("pq_adc_table", v, typedLit(books))
    // sub-cell m unpacked from the 4-bit-packed code
    def cellFromCode(code: Column, m: Int): Column =
      shiftright(code, 4 * m).bitwiseAND(15)

    val books = cachedByFingerprint(codebookCache, d)(
      trainPqBooks(base, "v", M, subDim, Ksub, iters))

    // encode: 16 × 4-bit sub-codes packed into one LONG (one kernel call
    // computes all M argmins), plus the reconstruction norm |x̂| — a pure
    // function of the code (subspaces are orthogonal, so |x̂|² =
    // Σ_m |c_m,code_m|²), computed ONCE per index vector here instead of
    // 16 extra lookups per candidate PAIR. The code lands in an
    // intermediate projection so the norm's 16 table lookups share the
    // single encode STRUCTURALLY.
    val normLit = typedLit((for (m <- 0 until M; k <- 0 until Ksub) yield
      books(m)(k).map(x => x * x).sum).toArray)
    val nb = sqrt((0 until M).map(m =>
      element_at(normLit, (cellFromCode(col("code"), m) + m * Ksub + 1).cast("int")))
      .reduce(_ + _))
    val codes = base
      .select(col("vec_id"), col("label"), pqEncode(col("v"), books).as("code"))
      .select(col("vec_id"), col("label"), col("code"), nb.as("nb"))
      .localCheckpoint(eager = true) // the 16-byte/row index, built once

    // query-side ADC tables: tbl[m·Ksub + k] = dot(q_m, c_mk), one kernel
    // call per query row
    val queriesSide = base.select(col("vec_id").as("ida"),
      pqAdcTable(col("v"), books).as("tbl"),
      sqrt(dot(col("v"), col("v"))).as("na"))

    // candidates: label-blocked self-join over (id, code, nb) ONLY
    val cand = codes.select(col("label"), col("vec_id").as("ida"))
      .join(codes.select(col("label"), col("vec_id").as("idb"),
        col("code"), col("nb")), Seq("label"))
      .where(col("ida") =!= col("idb"))
    // per-pair ADC sum as ONE compact kernel (pq_adc_score) — the
    // per-candidate hot path; same left-to-right order as the M-element_at
    // chain it replaces
    val scored = cand.join(queriesSide, Seq("ida"))
      .withColumn("dotApprox",
        call_function("pq_adc_score", col("tbl"), col("code"), lit(M)))
      .withColumn("cosApprox", col("dotApprox") / (col("na") * col("nb")))
    // ADC+R (Jégou et al. §V, same refinement l7f carries): the ADC pass
    // PRUNES to a short list and exact cosine re-ranks it. Pure 4-bit ADC
    // top-1 recall decays with corpus density (0.65 on the 500-vector
    // fixture, 0.52 at 2,000 — more near-ties than the code resolution
    // can order), while "keep a true neighbor in the ADC top-12" stays
    // easy at every fixture scale (recall ≥ 0.9 at all three SFs). Cost
    // shape at 100 TB: ids-only through the candidate window, then one
    // narrow C-rows-per-query fetch join per side, unhinted — AQE
    // broadcasts off runtime stats when small, shuffles on the id when
    // the payload side is corpus-scale (r17; a static broadcast() here
    // would be honored at ANY size).
    val rerankC = 12
    val wAdc = Window.partitionBy(col("ida")).orderBy(col("cosApprox").desc, col("idb"))
    val adcTop = scored
      .withColumn("rkApprox", row_number().over(wAdc))
      .where(col("rkApprox") <= rerankC)
      .select(col("ida"), col("idb"))
    val va = base.select(col("vec_id").as("ida"), col("v").as("va"))
      .withColumn("na", sqrt(dot(col("va"), col("va"))))
    val vb = base.select(col("vec_id").as("idb"), col("v").as("vb"))
      .withColumn("nb2", sqrt(dot(col("vb"), col("vb"))))
    val w = Window.partitionBy(col("ida")).orderBy(col("cos").desc, col("idb"))
    adcTop.join(va, Seq("ida")).join(vb, Seq("idb"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb2")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("ida"), col("idb"), col("rk"), round(col("cos"), 6).as("cos"))
  }

  /** L7f: ANN via IVF + residual PQ — IVFADC (Jégou, Douze, Schmid,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011, §IV):
    * the composition that is the production 100 TB path. l7c restricts
    * candidates to probed cells but ships RAW vectors into ranking; l7d
    * ranks from 16-byte codes but considers every same-label candidate.
    * IVFADC does both: a learned coarse quantizer routes each vector to
    * one cell, the RESIDUAL v − c(cell) is PQ-encoded (residuals are what
    * the sub-codebooks see, so the 4-bit budget quantizes the small
    * around-centroid displacements, not the full embedding range), and
    * ranking is ADC over codes restricted to probed cells, followed by
    * EXACT re-ranking of the ADC top-`rerankC` (the paper's §V "IVFADC+R"
    * refinement: 4-bit code noise caps pure-ADC top-1 recall ~0.58 on the
    * fixture; with re-rank the code only has to keep a true neighbor in
    * the top-C, lifting recall to ~0.8 — curve in PLANS.md).
    *
    * Score decomposition (all codegen'd, no vector reads after encode):
    * dot(q, x̂) = dot(q, c) + dot(q, r̂) — the first term falls out of the
    * probe stage (it IS the cell-ranking dot), the second is the ADC sum
    * over the query's residual table. |x̂| is a pure function of
    * (cell, code): |c|² + 2·dot(c, r̂) + |r̂|² via three LITERAL tables
    * (K, K·M·Ksub, M·Ksub doubles — driver-size), summed by the same
    * pq_adc_score kernel.
    *
    * Scale shape: the candidate join moves (label, cell, id, code:long,
    * nbhat:double) — 20 bytes/vector — and touches only nprobe/K of the
    * index per query. The query side re-attaches its ~2 KB ADC table once
    * (same posture as l7d; at production scale that join shuffles on ida).
    * Recall floor + determinism in ScalaTest; the DECLARED driver query
    * wraps this in [[annSummary]] so the recall contract is hash-checked
    * against the DuckDB oracle too (VERDICT r6 #1). */
  val l7fKnnIvfPq: Q = l7fKnnIvfPqWith(nprobe = 6, rerankC = 12)

  /** l7f core with the probe width and re-rank depth exposed as the
    * recall/cost knobs (swept to pick the declared defaults; curve in
    * PLANS.md). */
  private[graft] def l7fKnnIvfPqWith(nprobe: Int, rerankC: Int): Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecDot.register(s)
    graft.functions.PqExprs.register(s)
    val K = IvfK; val kmIters = IvfIters
    val M = 16; val subDim = 4; val Ksub = 16; val pqIters = 3
    val e = Tables.embeddings(s, d)
    val base = e.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .localCheckpoint(eager = true)

    val cents = cachedByFingerprint(centroidCache, d)(
      trainIvfCentroids(base, "v", K, kmIters))
    val centsLit = typedLit(cents)

    // assignment + residual, materialized once: the residual-book trainer,
    // the encode stage, the probe stage and the query re-attach all read it
    val assigned = base
      .withColumn("cell", centroidCellOf(col("v"), col("nrm"), cents))
      .withColumn("r", zip_with(col("v"), element_at(centsLit, col("cell") + 1),
        (x, c) => x - c))
      .localCheckpoint(eager = true)

    val rbooks = cachedByFingerprint(residualBookCache, d)(
      trainPqBooks(assigned, "r", M, subDim, Ksub, pqIters))

    def adcSum(tbl: Column, code: Column): Column =
      call_function("pq_adc_score", tbl, code, lit(M))

    // reconstruction-norm tables, all literal (driver-size):
    // |x̂|² = |c|² + 2·Σ_m dot(c_m, r̂_m) + Σ_m |r̂_m|², the middle term a
    // per-cell M·Ksub table so one pq_adc_score call sums the code's picks
    val cNormSq = cents.map(c => c.foldLeft(0.0)((t, x) => t + x * x))
    val rNormSq = (for (m <- 0 until M; k <- 0 until Ksub)
      yield rbooks(m)(k).foldLeft(0.0)((t, x) => t + x * x)).toArray
    val cross = cents.map { c =>
      (for (m <- 0 until M; k <- 0 until Ksub) yield {
        var t = 0.0; var i = 0
        while (i < subDim) { t += c(m * subDim + i) * rbooks(m)(k)(i); i += 1 }
        t
      }).toArray
    }
    val nbhat = sqrt(
      element_at(typedLit(cNormSq), col("cell") + 1) +
        lit(2.0) * adcSum(element_at(typedLit(cross), col("cell") + 1), col("code")) +
        adcSum(typedLit(rNormSq), col("code")))
    val index = assigned
      .select(col("vec_id").as("idb"), col("label"), col("cell"),
        call_function("pq_encode", col("r"), typedLit(rbooks)).as("code"))
      .withColumn("nbhat", nbhat)
      .localCheckpoint(eager = true) // the 20-byte/row IVFADC index

    // probe stage: raw dot(q, c) ranks cells identically to cosine (the
    // 1/|q| factor is positive) and doubles as the score's dot(q, c) term
    val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("qc").desc, col("cell"))
    val probes = assigned.select(col("vec_id"), col("label"),
        posexplode(array(cents.toIndexedSeq.map(c => dot(col("v"), typedLit(c))): _*))
          .as(Seq("cell", "qc")))
      .withColumn("pk", row_number().over(wProbe))
      .where(col("pk") <= nprobe)
      .select(col("label"), col("cell"), col("vec_id").as("ida"), col("qc"))

    val queryAttrs = assigned.select(col("vec_id").as("ida"),
      call_function("pq_adc_table", col("v"), typedLit(rbooks)).as("tbl"),
      col("nrm").as("na"))

    // every index vector lives in exactly ONE cell, so a candidate pair
    // appears at most once across probed cells — no dedup exchange needed
    val wAdc = Window.partitionBy(col("ida")).orderBy(col("cosApprox").desc, col("idb"))
    // SHUFFLE_HASH on the 20-byte/row index side: `probes` is the ×K
    // posexploded cell ranking, whose static size estimate is the
    // pre-explode lie (the l5 trap class) — the planner would broadcast
    // the whole corpus's probe table. Shuffled on (label, cell), build
    // maps hold one cell's codes.
    val adcTop = probes.join(index.hint("shuffle_hash"), Seq("label", "cell"))
      .where(col("ida") =!= col("idb"))
      .join(queryAttrs, Seq("ida"))
      .withColumn("cosApprox",
        (col("qc") + adcSum(col("tbl"), col("code"))) / (col("na") * col("nbhat")))
      .withColumn("rkApprox", row_number().over(wAdc))
      .where(col("rkApprox") <= rerankC)
      .select(col("ida"), col("idb"))

    // IVFADC+R (Jégou et al. §V): the ADC pass is the PRUNER (probed cells
    // → top-`rerankC` by approximate score), and the short survivor list is
    // re-ranked by EXACT cosine from re-attached raw vectors. The 4-bit
    // code noise that caps pure-ADC top-1 recall ~0.58 on the fixture
    // only has to keep a true neighbor within the top-C now, not put it
    // first. Cost shape at 100 TB: the re-rank join touches C rows per
    // query — ids only through the candidate window, then one narrow
    // fetch join per side, unhinted like l7d's re-attach (r17: AQE
    // broadcasts off runtime stats when small; a static broadcast()
    // would be honored at any size).
    val va = assigned.select(col("vec_id").as("ida"), col("v").as("va"),
      col("nrm").as("na"))
    val vb = assigned.select(col("vec_id").as("idb"), col("v").as("vb"),
      col("nrm").as("nb"))
    val w = Window.partitionBy(col("ida")).orderBy(col("cos").desc, col("idb"))
    adcTop.join(va, Seq("ida")).join(vb, Seq("idb"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("ida"), col("idb"), col("rk"), round(col("cos"), 6).as("cos"))
  }

  /** Fingerprint-stamped per-dir training memo, shared by the IVF centroid
    * and PQ codebook caches: ONE entry per source dir, stamped with the
    * embeddings fingerprint it was trained on. The fingerprint is the
    * STALENESS CHECK, not part of the key — a dataset mutated in place
    * retrains and REPLACES the entry instead of accumulating dead training
    * per rewrite for the JVM lifetime. Training is a deterministic
    * function of the data, so any session may share the result (a session
    * key would pin session objects in the map).
    *
    * get-check / put, NOT compute(): training runs multiple Spark collect
    * jobs and must not execute inside the map's bin lock (it would stall
    * unrelated keys and violates the compute contract). Two concurrent
    * first-callers may both train; determinism makes last-put-wins
    * harmless — idempotent work, never a wrong answer. */
  private def cachedByFingerprint[T](
      cache: java.util.concurrent.ConcurrentHashMap[String, (String, T)],
      d: String)(train: => T): T = {
    val fp = graft.core.Fingerprint.of(Tables.path(d, "embeddings"))
    Option(cache.get(d)) match {
      case Some((`fp`, cached)) => cached
      case _ =>
        val trained = train
        cache.put(d, (fp, trained))
        trained
    }
  }

  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[Array[Double]])]()

  private val codebookCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[Array[Array[Double]]])]()

  private val residualBookCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[Array[Array[Double]]])]()

  /** Driver-verifiable property summary for an ANN path (VERDICT r6 #1):
    * ONE row whose every value DuckDB can recompute from the fixture
    * tables — `n_queries` from the exact same-label pair space, plus
    * contract booleans checked against the IN-PLAN exact top-3. The
    * oracle asserts the booleans as TRUE, so a recall regression, a
    * broken candidate generator, or a coverage hole flips a value and
    * fails the driver's hash compare — the rows-only ANN entries become
    * hash-checked without DuckDB having to reproduce xxhash64 buckets or
    * trained codebooks. The neighbor ROWS themselves stay pinned by the
    * ScalaTest contracts (ApproxOpsSpec recall/determinism specs).
    *
    * recall = fraction of queries whose ANN top-1 is in the exact top-3;
    * coverage = fraction of queries the ANN path emitted any row for. */
  private def annSummary(ann: DataFrame, exact: DataFrame,
      recallFloor: Double, coverageFloor: Double): DataFrame = {
    val ex = exact.select(col("ida"), col("idb"))
    val nq = ex.agg(countDistinct(col("ida")).as("n_queries"))
    val hits = ann.where(col("rk") === 1).select(col("ida"), col("idb"))
      .join(ex, Seq("ida", "idb"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val cov = ann.agg(countDistinct(col("ida")).as("n_cov"))
    nq.crossJoin(hits).crossJoin(cov).select(
      col("n_queries"),
      (col("n_hits").cast("double") / col("n_queries") >= recallFloor)
        .as("recall_ok"),
      (col("n_cov").cast("double") / col("n_queries") >= coverageFloor)
        .as("coverage_ok"))
  }

  /** The capped-pair analogue of [[annSummary]] for l6c: the cap may only
    * DROP pairs (subset_ok — checked row-by-row against the in-plan exact
    * pair table, cos values included) and must retain at least `safety` ×
    * the UNIFORM-SPLIT EXPECTATION of the exact pairs.
    *
    * The floor is computed IN-PLAN from the label-size distribution
    * (Σ_label exact_pairs(label) · 2^-bits(label), bits from the same
    * [[bitsFor]] the router uses) instead of a constant: a constant floor
    * is a per-fixture calibration that a 10× corpus silently breaks (the
    * round-6 floors held at sf0.001/0.01 and failed at sf0.1, where
    * cap=48 splits every ~200-row label into 8 cells). The uniform bound
    * is scale-invariant and conservative — a random split keeps a pair
    * with probability 2^-bits, while the hyperplane split keeps
    * HIGH-COSINE pairs with ≥ 0.5 per bit by the LSH collision guarantee
    * — yet still hard: a broken router (wrong cells, dropped labels)
    * sends retention to ~2^-maxBits and fails it at any scale. */
  private def cappedPairsSummary(capped: DataFrame, exact: DataFrame,
      emb: DataFrame, cap: Long, safety: Double): DataFrame = {
    val sizes = emb.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    val floor = exact.groupBy(col("label")).agg(count(lit(1)).as("npairs"))
      .join(sizes, Seq("label"))
      .agg(sum(col("npairs") * pow(lit(0.5), bitsFor(col("cnt"), cap)))
        .as("floor_pairs"))
    val nEx = exact.agg(count(lit(1)).as("n_exact_pairs"))
    val nCap = capped.agg(count(lit(1)).as("n_capped"))
    val nBad = capped.exceptAll(exact).agg(count(lit(1)).as("n_bad"))
    nEx.crossJoin(nCap).crossJoin(nBad).crossJoin(floor).select(
      col("n_exact_pairs"),
      (col("n_bad") === 0).as("subset_ok"),
      (col("n_capped").cast("double") >= lit(safety) * col("floor_pairs"))
        .as("recall_ok"))
  }

  /** [[annSummary]] for the CAPPED brute path (l7e), with the same
    * in-plan uniform-split floor as [[cappedPairsSummary]]: a query's
    * recall hit is guaranteed whenever its exact-top-1 partner lands in
    * the same cell (the surviving best IS the capped top-1), which a
    * uniform split does with probability 2^-bits(label(query)) — so
    * n_hits must be ≥ `safety` × Σ_queries 2^-bits. Scale-invariant where
    * the round-6 constant floor (0.85) broke at sf0.1. */
  private def cappedKnnSummary(ann: DataFrame, exact: DataFrame,
      emb: DataFrame, cap: Long, safety: Double,
      coverageFloor: Double): DataFrame = {
    val sizes = emb.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    val ex = exact.select(col("ida"), col("idb"))
    val floor = ex.select(col("ida")).distinct()
      .join(emb.select(col("vec_id").as("ida"), col("label")), Seq("ida"))
      .join(sizes, Seq("label"))
      .agg(sum(pow(lit(0.5), bitsFor(col("cnt"), cap))).as("floor_hits"))
    val nq = ex.agg(countDistinct(col("ida")).as("n_queries"))
    val hits = ann.where(col("rk") === 1).select(col("ida"), col("idb"))
      .join(ex, Seq("ida", "idb"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val cov = ann.agg(countDistinct(col("ida")).as("n_cov"))
    nq.crossJoin(hits).crossJoin(cov).crossJoin(floor).select(
      col("n_queries"),
      (col("n_hits").cast("double") >= lit(safety) * col("floor_hits"))
        .as("recall_ok"),
      (col("n_cov").cast("double") / col("n_queries") >= coverageFloor)
        .as("coverage_ok"))
  }

  /** L36: SemDeDup — semantic deduplication over LEARNED clusters (Abbas
    * et al. 2023, arXiv:2303.09540, the web-scale semantic-dedup recipe):
    * embeddings are clustered by the shared spherical k-means quantizer
    * (the SAME trained centroids l7c/l7f use, via the fingerprint cache —
    * one trainer, three consumers, guaranteed-identical assignment);
    * within each cluster, pairs at cosine ≥ τ are semantic duplicates,
    * and each dup pair drops its member CLOSER to the cluster centroid
    * (the paper's keep-low-centroid-similarity policy: the prototypical
    * member is the redundant one), ties broken by vec_id so the survivor
    * set is deterministic under any partitioning.
    *
    * Scale design (r19 rewrite, see [[semDedupDropSet]]): candidate pairs
    * exist ONLY within a cluster — the paper's whole point, never
    * corpus×corpus — and, since r19, only between exact-duplicate-group
    * REPRESENTATIVES: the decade rehearsal caught the member-level pair
    * stage going quadratic in exact-copy count at the 100× tier (787 s,
    * e2_pure 2.44 — any pairwise dedup's pair list is Ω(duplicate pairs),
    * and a dup-heavy corpus explodes it). Exact groups collapse through
    * the pair stage and the pairwise-greedy drop rule is evaluated
    * group-wise — provably the same drop set, with pair volume quadratic
    * only in DISTINCT vectors per cell (bounded further by the l6c
    * sub-cell cap at [[semCap]]; at fixture SFs neither mechanism changes
    * a single pair — max cell 140 distinct vectors at sf0.1 vs cap 512 —
    * so the declared results are bit-identical to naive per-cluster
    * SemDeDup everywhere the oracle looks). ids + centroid similarity
    * travel through the pair join, vectors re-attach by unhinted id joins
    * (runtime-stat broadcast at fixture scale, a co-partitioned id
    * shuffle at 100 TB — r17). Measured price/win of the collapse
    * (fresh-JVM decade cells): ~+1.2 s at sf0.1 (three extra
    * metadata-scale stages) for 787 s → 4.85 s at the 100× tier —
    * e2_pure 2.44 → 0.29 (tools/growth_decades.json).
    *
    * Declared as a property-form summary row (the annSummary pattern):
    * `n_vectors` is exact (DuckDB recomputes it), the booleans are
    * in-plan checks the oracle asserts TRUE — partition_ok
    * (kept + dropped = all), dedup_ok (NO within-cluster pair at ≥ τ
    * survives — the SemDeDup guarantee), drops_bounded_ok (at least one
    * member of every dup group survives). Row-level behavior is pinned
    * by the ApproxOpsSpec contract. */
  val l36SemDedup: Q = (s, d) => {
    graft.functions.VecDot.register(s)
    val tau = 0.35
    val e = Tables.embeddings(s, d)
    val base = e.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm")).localCheckpoint(eager = true)
    val cents = cachedByFingerprint(centroidCache, d)(
      trainIvfCentroids(base, "embedding", IvfK, IvfIters))
    val ds = array(cents.toIndexedSeq.map(c =>
      dot(col("embedding"), typedLit(c)) / col("nrm")): _*)
    // cell + similarity-to-own-centroid in one pass; materialized once —
    // the pair join reads it twice and the kept/dropped checks re-read it
    val assigned = base.select(col("vec_id"), col("embedding"), col("nrm"),
      (array_position(ds, array_max(ds)) - 1).cast("int").as("cell"),
      array_max(ds).as("csim"))
      .localCheckpoint(eager = true)
    val (dropped0, pairs) = semDedupDropSet(assigned, tau)
    // read by kept + the count + BOTH resid anti-joins
    val dropped = dropped0.localCheckpoint(eager = true)
    val kept = assigned.select(col("vec_id"))
      .join(dropped, Seq("vec_id"), "left_anti")
    val nAll = assigned.agg(count(lit(1)).as("n_vectors"))
    val nKept = kept.agg(count(lit(1)).as("n_kept"))
    val nDropped = dropped.agg(count(lit(1)).as("n_dropped"))
    // a surviving within-cluster τ-pair would have BOTH ends kept
    val resid = pairs
      .join(dropped.select(col("vec_id").as("ida")), Seq("ida"), "left_anti")
      .join(dropped.select(col("vec_id").as("idb")), Seq("idb"), "left_anti")
      .agg(count(lit(1)).as("n_resid"))
    nAll.crossJoin(nKept).crossJoin(nDropped).crossJoin(resid).select(
      col("n_vectors"),
      (col("n_kept") + col("n_dropped") === col("n_vectors")).as("partition_ok"),
      (col("n_resid") === 0).as("dedup_ok"),
      (col("n_dropped") < col("n_vectors")).as("drops_bounded_ok"))
  }

  /** SemDeDup SURVIVORS over ANY (vec_id, embedding) frame — the registry
    * transform (`semdedup`): clusters trained on the input itself, within-
    * cluster τ-pairs drop the centroid-closer member, survivors join back
    * to the caller's rows. */
  private[graft] def semDedupFrames(emb: DataFrame, tau: Double,
      k: Int, iters: Int): DataFrame = {
    graft.functions.VecDot.register(emb.sparkSession)
    val base = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm")).localCheckpoint(eager = true)
    val cents = trainIvfCentroids(base, "embedding", k, iters)
    val ds = array(cents.toIndexedSeq.map(c =>
      dot(col("embedding"), typedLit(c)) / col("nrm")): _*)
    val assigned = base.select(col("vec_id"), col("embedding"), col("nrm"),
      (array_position(ds, array_max(ds)) - 1).cast("int").as("cell"),
      array_max(ds).as("csim"))
      .localCheckpoint(eager = true)
    val dropped = semDedupDropSet(assigned, tau)._1
    emb.join(dropped, Seq("vec_id"), "left_anti")
  }

  /** Within-cluster τ-pair candidates over a (vec_id, embedding, nrm,
    * cell, csim) frame, with the l6c hyperplane sub-cell cap engaged on
    * cells over `cap`. Called on the exact-duplicate-group REPRESENTATIVES
    * (see [[semDedupDropSet]]), never raw members. */
  private val semCap = 512L
  private def semDedupPairs(assigned: DataFrame, tau: Double,
      cap: Long = semCap): DataFrame = {
    val blocked = subBlockedBy(assigned, "cell", cap, "sub")
    val ids = blocked.select(col("cell"), col("sub"), col("vec_id"), col("csim"))
    val cand = ids.select(col("cell"), col("sub"), col("vec_id").as("ida"),
        col("csim").as("ca"))
      .join(ids.select(col("cell"), col("sub"), col("vec_id").as("idb"),
        col("csim").as("cb")), Seq("cell", "sub"))
      .where(col("ida") < col("idb"))
    val va = assigned.select(col("vec_id").as("ida"),
      col("embedding").as("va"), col("nrm").as("na"))
    val vb = assigned.select(col("vec_id").as("idb"),
      col("embedding").as("vb"), col("nrm").as("nb"))
    cand.join(va, Seq("ida")).join(vb, Seq("idb"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= tau)
      .select(col("ida"), col("idb"), col("ca"), col("cb"))
  }

  /** The SemDeDup drop set (r19 rewrite — shared by l36SemDedup /
    * semDedupFrames / semDedupAssignments): returns (dropped vec_ids,
    * representative-level τ-pairs).
    *
    * The r19 decade rehearsal caught the member-level pair stage going
    * QUADRATIC at the 100× tier (787 s, e2_pure 2.44): the pair list of
    * any pairwise dedup is Ω(duplicate pairs) — quadratic in exact-copy
    * count — and a duplicate-heavy corpus (the 100× fixture holds 100
    * exact copies of every vector; web scale does the same) explodes it.
    * The fix is the classic dedup-pipeline ordering applied INSIDE the
    * operator: exact-duplicate groups (cell, embedding) collapse to their
    * min-id representative through the pair stage, and the pairwise-greedy
    * drop rule is evaluated GROUP-WISE, exactly:
    *   member v of group V drops  ⟺  ∃ τ-neighbor u with
    *     struct(csim_u, id_u) < struct(csim_v, id_v)
    *   ⟺  (|V| ≥ 2 ∧ 1.0 ≥ τ ∧ id_v > min_id(V))        — a group-mate
    *       (exact copies pair at cosine 1.0, τ ≤ 1 always in practice)
    *    ∨  (min over adjacent groups U of (csim_U, min_id(U))
    *        < (csim_v, id_v))                            — a cross-group
    *       witness; all member pairs of adjacent groups share the reps'
    *       cosine, and the minimal struct in U witnesses for every v.
    * Row-for-row equal to member-level pairwise greedy (pinned by the
    * ApproxOpsSpec independent recomputation); pair volume is quadratic
    * only in DISTINCT vectors per cell. Measured at the 100× tier: the
    * member-level stage's 787 s fell to seconds (growth_decades.json).
    * Oversized distinct-vector cells still split via [[semDedupPairs]]'s
    * sub-cell cap; an angularly TIGHT hot cell defeats LSH splitting by
    * design — the remedy at that scale is K ∝ N (SemDeDup's own posture,
    * the registry transform's `k` knob). */
  private[graft] def semDedupDropSet(assigned: DataFrame, tau: Double,
      cap: Long = semCap): (DataFrame, DataFrame) = {
    val groups = assigned.groupBy(col("cell"), col("embedding"))
      .agg(first(col("nrm")).as("nrm"), first(col("csim")).as("csim"),
        min(col("vec_id")).as("vec_id"), count(lit(1)).as("gsize"))
      .localCheckpoint(eager = true) // pair sides + member join; honest stats
    val pairs = semDedupPairs(groups, tau, cap)
    val adjMin = pairs.select(col("ida").as("rep_id"),
        struct(col("cb").as("c"), col("idb").as("i")).as("m"))
      .unionByName(pairs.select(col("idb").as("rep_id"),
        struct(col("ca").as("c"), col("ida").as("i")).as("m")))
      .groupBy(col("rep_id")).agg(min(col("m")).as("adj_min"))
    val withGroup = assigned
      .select(col("vec_id"), col("cell"), col("embedding"), col("csim"))
      .join(groups.select(col("cell"), col("embedding"),
        col("vec_id").as("rep_id"), col("gsize")), Seq("cell", "embedding"))
      .join(adjMin, Seq("rep_id"), "left_outer")
    val groupMatesAreDups = 1.0 >= tau
    val dropped = withGroup.where(
        (lit(groupMatesAreDups) && col("gsize") >= 2 &&
          col("vec_id") > col("rep_id")) ||
        (col("adj_min").isNotNull &&
          col("adj_min") < struct(col("csim").as("c"), col("vec_id").as("i"))))
      .select(col("vec_id"))
    (dropped, pairs)
  }

  /** L37: prototypicality-based data pruning (Sorscher et al. 2022,
    * "Beyond neural scaling laws", the SSL-prototypes metric): similarity
    * to a vector's own k-means centroid ranks examples
    * prototypical(easy) → marginal(hard); keeping the HARD fraction per
    * cluster is the paper's data-pruning recipe at scale (easy examples
    * are the redundant ones once the corpus is large). Shares the trained
    * centroids with l7c/l7f/l36 via the fingerprint cache — assignment is
    * K codegen'd dots per row, ranking is ONE cell-partitioned window
    * (cells are the blocking key, so no global sort exists anywhere).
    *
    * Property-form summary (the l36 pattern): n_vectors exact; the
    * booleans assert the pruning invariants in-plan — partition_ok
    * (kept + dropped = all), frac_ok (every cell keeps exactly
    * ceil(frac · size) members), hardness_ok (within every cell, each
    * kept member is at most as prototypical as every dropped one). */
  val l37ProtoPrune: Q = (s, d) => {
    val sized = protoPruneAssignments(s, d)
    val nAll = sized.agg(count(lit(1)).as("n_vectors"))
    val nKept = sized.where(col("is_kept")).agg(count(lit(1)).as("n_kept"))
    val nDropped = sized.where(!col("is_kept")).agg(count(lit(1)).as("n_dropped"))
    val fracBad = sized.groupBy(col("cell"), col("keep_n"))
      .agg(sum(when(col("is_kept"), 1L).otherwise(0L)).as("kept_in_cell"))
      .where(col("kept_in_cell") =!= col("keep_n"))
      .agg(count(lit(1)).as("n_frac_bad"))
    val hardBad = sized.groupBy(col("cell"))
      .agg(max(when(col("is_kept"), col("csim"))).as("max_kept"),
        min(when(!col("is_kept"), col("csim"))).as("min_dropped"))
      .where(col("min_dropped").isNotNull && col("max_kept") > col("min_dropped"))
      .agg(count(lit(1)).as("n_hard_bad"))
    nAll.crossJoin(nKept).crossJoin(nDropped).crossJoin(fracBad).crossJoin(hardBad)
      .select(
        col("n_vectors"),
        (col("n_kept") + col("n_dropped") === col("n_vectors")).as("partition_ok"),
        (col("n_frac_bad") === 0).as("frac_ok"),
        (col("n_hard_bad") === 0).as("hardness_ok"))
  }

  /** Row-level prototypicality internals for the ScalaTest contract AND
    * [[l37ProtoPrune]]'s summary: (vec_id, cell, csim, rk, cell_n, keep_n,
    * is_kept) per vector at keepFrac=0.5, shared trained centroids. */
  private[graft] def protoPruneAssignments(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecDot.register(s)
    val keepFrac = 0.5
    val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm")).localCheckpoint(eager = true)
    val cents = cachedByFingerprint(centroidCache, d)(
      trainIvfCentroids(base, "embedding", IvfK, IvfIters))
    val ds = array(cents.toIndexedSeq.map(c =>
      dot(col("embedding"), typedLit(c)) / col("nrm")): _*)
    val assigned = base.select(col("vec_id"),
      (array_position(ds, array_max(ds)) - 1).cast("int").as("cell"),
      array_max(ds).as("csim"))
      .localCheckpoint(eager = true)
    // hardest-first rank: LOWEST centroid similarity = most marginal
    val w = Window.partitionBy(col("cell")).orderBy(col("csim"), col("vec_id"))
    assigned
      .withColumn("rk", row_number().over(w))
      .withColumn("cell_n", count(lit(1)).over(Window.partitionBy(col("cell"))))
      .withColumn("keep_n", ceil(col("cell_n") * keepFrac).cast("long"))
      .withColumn("is_kept", col("rk") <= col("keep_n"))
  }

  /** Prototypicality-pruning SURVIVORS over ANY (vec_id, embedding) frame
    * — the registry transform (`proto_prune`): keep the `frac` hardest
    * (least prototypical) members of every cluster, quantizer trained on
    * the input itself. */
  private[graft] def protoPruneFrames(emb: DataFrame, frac: Double,
      k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecDot.register(emb.sparkSession)
    val base = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm")).localCheckpoint(eager = true)
    val cents = trainIvfCentroids(base, "embedding", k, iters)
    val ds = array(cents.toIndexedSeq.map(c =>
      dot(col("embedding"), typedLit(c)) / col("nrm")): _*)
    val w = Window.partitionBy(col("cell")).orderBy(col("csim"), col("vec_id"))
    val kept = base.select(col("vec_id"),
        (array_position(ds, array_max(ds)) - 1).cast("int").as("cell"),
        array_max(ds).as("csim"))
      .withColumn("rk", row_number().over(w))
      .withColumn("cell_n", count(lit(1)).over(Window.partitionBy(col("cell"))))
      .where(col("rk") <= ceil(col("cell_n") * frac).cast("long"))
      .select(col("vec_id"))
    emb.join(kept, Seq("vec_id"), "left_semi")
  }

  /** Row-level SemDeDup internals for the ScalaTest contract: (vec_id,
    * cell, csim, is_kept) per vector. Same plan as [[l36SemDedup]] up to
    * the summary. */
  private[graft] def semDedupAssignments(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    graft.functions.VecDot.register(s)
    val tau = 0.35
    val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm")).localCheckpoint(eager = true)
    val cents = cachedByFingerprint(centroidCache, d)(
      trainIvfCentroids(base, "embedding", IvfK, IvfIters))
    val ds = array(cents.toIndexedSeq.map(c =>
      dot(col("embedding"), typedLit(c)) / col("nrm")): _*)
    val assigned = base.select(col("vec_id"), col("embedding"), col("nrm"),
      (array_position(ds, array_max(ds)) - 1).cast("int").as("cell"),
      array_max(ds).as("csim"))
      .localCheckpoint(eager = true)
    val dropped = semDedupDropSet(assigned, tau)._1
      .withColumn("is_kept", lit(false))
    assigned.select(col("vec_id"), col("cell"), col("csim"))
      .join(dropped, Seq("vec_id"), "left_outer")
      .withColumn("is_kept", coalesce(col("is_kept"), lit(true)))
  }

  // Constant floors: measured at ALL THREE driver scales (sf0.001 /
  // sf0.01 / sf0.1) with ≥ 0.05 margin under the worst point:
  // l7b .648/.626/.685, l7c .654/.640/.674 (cov ≥ .996),
  // l7d (ADC+R, rerankC=12) ≥ .9 everywhere, l7f see sweep in PLANS.md.
  // The CAPPED paths (l6c, l7e) intentionally trade recall for bounded
  // buckets as labels outgrow the cap, so a constant floor cannot hold
  // across scales — they use the in-plan uniform-split expectation floors
  // (cappedPairsSummary / cappedKnnSummary) instead.
  private val covFloor = 0.98
  private val blockCap = 48L

  val queries: Map[String, Q] = Map(
    "l6_cosine_pairs" -> l6CosinePairs,
    "l6b_embed_dedup" -> l6bEmbedDedup,
    "l6c_cosine_pairs_capped" -> ((s, d) =>
      cappedPairsSummary(l6cCosinePairsCapped(s, d), l6CosinePairs(s, d),
        Tables.embeddings(s, d), blockCap, safety = 0.85)),
    "l7_knn_brute" -> l7KnnBruteForce,
    "l7b_knn_lsh" -> ((s, d) =>
      annSummary(l7bKnnLsh(s, d), l7KnnBruteForce(s, d), 0.55, covFloor)),
    "l7c_knn_ivf" -> ((s, d) =>
      annSummary(l7cKnnIvf(s, d), l7KnnBruteForce(s, d), 0.55, covFloor)),
    "l7d_knn_pq" -> ((s, d) =>
      annSummary(l7dKnnPq(s, d), l7KnnBruteForce(s, d), 0.8, covFloor)),
    "l7e_knn_brute_capped" -> ((s, d) =>
      cappedKnnSummary(l7eKnnBruteCapped(s, d), l7KnnBruteForce(s, d),
        Tables.embeddings(s, d), blockCap, safety = 0.9, covFloor)),
    "l7f_knn_ivfpq" -> ((s, d) =>
      annSummary(l7fKnnIvfPq(s, d), l7KnnBruteForce(s, d), 0.8, covFloor)),
    "l36_semdedup" -> l36SemDedup,
    "l37_proto_prune" -> l37ProtoPrune
  )

  /** Oracle twin of [[annSummary]]: `n_queries` is the count of vectors
    * with at least one same-label partner (exactly the ids the in-plan
    * exact top-3 ranks), and the contract booleans are asserted TRUE. */
  private val annSummaryOracle =
    """SELECT CAST(count(DISTINCT a.vec_id) AS BIGINT) AS n_queries,
              TRUE AS recall_ok, TRUE AS coverage_ok
       FROM embeddings a JOIN embeddings b
         ON a.label = b.label AND a.vec_id <> b.vec_id"""

  val oracle: Map[String, String] = Map(
    "l36_semdedup" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors,
                TRUE AS partition_ok, TRUE AS dedup_ok,
                TRUE AS drops_bounded_ok
         FROM embeddings""",
    "l37_proto_prune" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors,
                TRUE AS partition_ok, TRUE AS frac_ok,
                TRUE AS hardness_ok
         FROM embeddings""",
    "l7b_knn_lsh" -> annSummaryOracle,
    "l7c_knn_ivf" -> annSummaryOracle,
    "l7d_knn_pq" -> annSummaryOracle,
    "l7e_knn_brute_capped" -> annSummaryOracle,
    "l7f_knn_ivfpq" -> annSummaryOracle,
    "l6c_cosine_pairs_capped" ->
      """WITH e AS (SELECT vec_id, label, embedding,
                sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                      FROM (SELECT unnest(embedding) AS x))) AS nrm
              FROM embeddings),
            p AS (SELECT * FROM (
                   SELECT a.label, a.vec_id AS ida, b.vec_id AS idb,
                          round((SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                                 FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
                                / (a.nrm * b.nrm), 6) AS cos
                   FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
                  WHERE cos > 0.2)
         SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
                TRUE AS subset_ok, TRUE AS recall_ok
         FROM p""",
    "l6b_embed_dedup" ->
      """WITH RECURSIVE
            e AS (SELECT vec_id, label, embedding,
                  sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                        FROM (SELECT unnest(embedding) AS x))) AS nrm
                FROM embeddings),
            p AS (SELECT * FROM (
                   SELECT a.vec_id AS da, b.vec_id AS db,
                          round((SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                                 FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
                                / (a.nrm * b.nrm), 6) AS cos
                   FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
                  WHERE cos >= 0.35),
            edges AS (SELECT da, db FROM p UNION SELECT db AS da, da AS db FROM p),
            reach(a, b) AS (
              SELECT vec_id AS a, vec_id AS b FROM embeddings
              UNION
              SELECT r.a, x.db AS b FROM reach r JOIN edges x ON r.b = x.da)
         SELECT a AS vec_id, min(b) AS component,
                a = min(b) AS is_canonical
         FROM reach GROUP BY a""",
    "l6_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, label, embedding,
                sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                      FROM (SELECT unnest(embedding) AS x))) AS nrm
              FROM embeddings)
         SELECT * FROM (
           SELECT a.label, a.vec_id AS ida, b.vec_id AS idb,
                  round((SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                         FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
                        / (a.nrm * b.nrm), 6) AS cos
           FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         WHERE cos > 0.2""",
    "l7_knn_brute" ->
      """WITH e AS (SELECT vec_id, label, embedding,
                sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                      FROM (SELECT unnest(embedding) AS x))) AS nrm
              FROM embeddings),
            pairs AS (
              SELECT a.vec_id AS ida, b.vec_id AS idb,
                     (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                      FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
                     / (a.nrm * b.nrm) AS cos
              FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id)
         SELECT ida, idb,
                row_number() OVER (PARTITION BY ida ORDER BY cos DESC, idb) AS rk,
                round(cos, 6) AS cos
         FROM pairs
         QUALIFY rk <= 3"""
  )
}
