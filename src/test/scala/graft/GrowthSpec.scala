package graft

import graft.ops.{EventOps, Layout, TextOps, VectorOps, Windows}

/** Scale-growth regression net for the quadratic-RISK family: the near-dup
  * operators are all bucketed (inverted-index / LSH-band / byte-pair
  * multi-index self-joins) precisely so that corpus growth does NOT square
  * the work. A future edit that accidentally reintroduces an unblocked
  * pair join (the O(n²) failure mode) passes every fixed-size correctness
  * test and only shows up as super-linear wall-time growth — this spec is
  * the guard for exactly that.
  *
  * Method: run each operator on the sf0.01 corpus (500 docs) and the
  * sf0.1 corpus (5,000 docs) — 10× the rows, so a quadratic plan costs
  * ~100× — and assert the wall-time ratio stays far below quadratic. The
  * bound (25×) is loose on purpose: it tolerates machine-load noise and
  * fixed per-job overheads while still catching any O(n²) regression by an
  * order of magnitude (an unblocked 5,000-doc cross join also blows past
  * it on absolute time). A denominator floor keeps sub-100ms small-corpus
  * runs from turning scheduler jitter into a ratio.
  */
class GrowthSpec extends SparkSpec {
  private val small = "/root/testdata/sf0.01"
  private val large = "/root/testdata/sf0.1"

  private def secs(work: => Unit): Double = {
    val t0 = System.nanoTime()
    work
    (System.nanoTime() - t0) / 1e9
  }

  // l5e/l5f (dedup groups/apply): the connected-components loop on top of
  // the l5b pair generator — O(diameter) frontier rounds whose shuffles are
  // edge-endpoint-sized; a regression to per-round full-table joins (or an
  // unblocked pair input) shows up as super-linear growth here. s9/s10
  // (z-order layout, compaction) and l19/l11b (chunking, repetition) are
  // write-or-explode shaped — linear by design, guarded since round 7
  // (VERDICT r6 #5: they carry scale claims, so they carry growth tests).
  for ((name, q) <- Seq(
      "l5_jaccard_pairs" -> TextOps.l5JaccardPairs,
      "l5b_minhash_lsh" -> TextOps.l5bMinhashLsh,
      "l5c_simhash" -> TextOps.l5cSimhash,
      "l17_decontaminate" -> TextOps.l17Decontaminate,
      "l5e_dedup_groups" -> TextOps.queries("l5e_dedup_groups"),
      "l5f_dedup_apply" -> TextOps.queries("l5f_dedup_apply"),
      "l19_chunk" -> TextOps.queries("l19_chunk"),
      "l20_substring_dup" -> TextOps.queries("l20_substring_dup"),
      "l21_lm_score" -> TextOps.queries("l21_lm_score"),
      "l11b_repetition" -> TextOps.queries("l11b_repetition"),
      "l23_tfidf" -> TextOps.queries("l23_tfidf"),
      "l24_bm25" -> TextOps.queries("l24_bm25"),
      "l25_temperature_mix" -> TextOps.queries("l25_temperature_mix"),
      "l27_incremental_dedup" -> TextOps.queries("l27_incremental_dedup"),
      "l28_containment" -> TextOps.queries("l28_containment"),
      "l28b_containment_dedup" -> TextOps.queries("l28b_containment_dedup"),
      "l29_novelty" -> TextOps.queries("l29_novelty"),
      // PMI's quadratic risk is the per-doc token self-join it replaces
      // with slot-key equi-joins; gap-fill's is an accidental
      // calendar×users cross join instead of the per-user bounds spine;
      // w7's is the events×events interval join the range frame avoids.
      "l30_pmi_cooccur" -> TextOps.queries("l30_pmi_cooccur"),
      "l31_quality_rank" -> TextOps.queries("l31_quality_rank"),
      // l33's quadratic risk is unblocked all-pairs Levenshtein (len²
      // per pair, n² pairs); l34's is a df-keyed self-join bucketing on
      // document frequency instead of the distinct source set; l32 and
      // e8 are agg/explode shaped — linear by construction, guarded
      // because they carry scale claims.
      "l32_mad_outliers" -> TextOps.queries("l32_mad_outliers"),
      "l33_edit_dedup" -> TextOps.queries("l33_edit_dedup"),
      "l34_source_overlap" -> TextOps.queries("l34_source_overlap"),
      "e5_gap_fill" -> EventOps.queries("e5_gap_fill"),
      "e8_active_users" -> EventOps.queries("e8_active_users"),
      "e9_anomaly" -> EventOps.queries("e9_anomaly"),
      // triangle counting's quadratic risk is the wedge join exploding on
      // hub nodes — degree-ordered orientation is exactly what bounds it
      "l35_triangles" -> graft.ops.Graphs.queries("l35_triangles"),
      // j10's quadratic risk is the nested-loop pure-range join banding
      // replaces; mm4's is an unblocked payload×payload compare (or a
      // boilerplate frame turning one bucket quadratic — the df cap);
      // e10/s16 are window-shaped, guarded for their scale claims.
      "j10_time_band_join" -> graft.ops.Relational.queries("j10_time_band_join"),
      "mm4_frame_dup" -> graft.ops.MultiModal.queries("mm4_frame_dup"),
      "e10_event_paths" -> EventOps.queries("e10_event_paths"),
      "s16_scd2_history" -> graft.ops.Relational.queries("s16_scd2_history"),
      "w7_time_range" -> Windows.queries("w7_time_range"),
      "s9_zorder_layout" -> Layout.s9ZorderLayout,
      "s10_compaction" -> Layout.s10Compaction,
      // round-8 additions with scale claims: LPA is edge-linear per round
      // (a regression to unoriented wedge joins squares on hubs); DSIR is
      // gram-linear (an unbucketed gram cross join squares); the split is
      // CC + a projection
      "l40_label_prop" -> graft.ops.Graphs.queries("l40_label_prop"),
      "l41_dsir_weights" -> TextOps.queries("l41_dsir_weights"),
      "l38_group_split" -> TextOps.queries("l38_group_split"),
      // entropy is agg→agg (token-linear); zipf's risk is the rank window
      // accidentally running over the exploded token stream instead of
      // the aggregated vocabulary; e12's is a purchases×touches
      // inequality join instead of the one carried-struct window
      "l39_token_entropy" -> TextOps.queries("l39_token_entropy"),
      "l43_zipf_slope" -> TextOps.queries("l43_zipf_slope"),
      "e12_attribution" -> EventOps.queries("e12_attribution"),
      // e13's quadratic risk is an events×events inequality self-join
      // instead of chained filtered min-aggs; l44's is joining the
      // corpus marginals from a second corpus-scale scan instead of
      // reaggregating the vocab table
      "e13_funnel_steps" -> EventOps.queries("e13_funnel_steps"),
      "l44_source_kl" -> TextOps.queries("l44_source_kl"),
      // p10's risk is distinct state growing with events instead of hour
      // buckets; o7's is a global sort replacing TakeOrdered; o6's is the
      // O(n²) dominance self-join the window formulation avoids
      "p10_freshness" -> graft.ops.Relational.queries("p10_freshness"),
      "o7_weighted_sample" -> graft.ops.SortsSets.queries("o7_weighted_sample"),
      "o6_skyline" -> graft.ops.SortsSets.queries("o6_skyline"),
      // l45's quadratic risk is EXACTLY what prefix filtering bounds: a
      // regression that indexes the full shingle set (or drops the length
      // filter) re-inflates the candidate join toward l5's df² volume;
      // l46's is recomputing degrees over the ORIGINAL graph each round
      // (never shrinking) or a join keyed on degree instead of the edge;
      // e14/e15 are single-user-keyed-window shaped — linear, guarded
      // for their scale claims (e15's risk is the spine cross join e5
      // guards against; e14's a collect of unbounded whole-type structs)
      "l45_prefix_join" -> TextOps.queries("l45_prefix_join"),
      "l46_kcore" -> graft.ops.Graphs.queries("l46_kcore"),
      "e14_pattern_match" -> EventOps.queries("e14_pattern_match"),
      "e15_ewma" -> EventOps.queries("e15_ewma"),
      // g15 is two token-keyed aggs + a broadcast probe join; its risk is
      // the probe join shuffling the corpus instead of broadcasting
      "g15_cm_sketch" -> graft.ops.Aggregates.queries("g15_cm_sketch"),
      // e18/e19's quadratic risk is the purchases×touches inequality join
      // the banding replaces; l51's is the basket self-join exploding on a
      // hot basket (baskets here are order-sized, but a regression that
      // drops the distinct or aggregates after the marginal joins squares);
      // l47's is a LIKE rescan instead of the filtered positional join;
      // l48's is the vocab join shuffling the corpus instead of
      // broadcasting; l49/e17 ride the CC/session exchanges they reuse;
      // j11's is the interval filter degenerating to an unkeyed range join
      "e18_linear_attribution" -> EventOps.queries("e18_linear_attribution"),
      "e19_position_attribution" -> EventOps.queries("e19_position_attribution"),
      "e17_session_funnel" -> EventOps.queries("e17_session_funnel"),
      "l51_basket_lift" -> graft.ops.Graphs.queries("l51_basket_lift"),
      "l47_phrase_search" -> TextOps.queries("l47_phrase_search"),
      "l48_oov_rate" -> TextOps.queries("l48_oov_rate"),
      "l49_dedup_keep_best" -> TextOps.queries("l49_dedup_keep_best"),
      "j11_pit_join" -> graft.ops.Relational.queries("j11_pit_join"),
      // l52's quadratic risk is computing the pooled CDF with a GLOBAL
      // window over the grid (single-partition shuffle of every row) or
      // gridding on raw docs instead of the aggregated length counts
      "l52_ks_drift" -> TextOps.queries("l52_ks_drift"))) {
    test(s"$name: 10x corpus growth stays sub-quadratic in wall time") {
      q(spark, small).count() // warm-up: codegen + first-shuffle costs
      val tSmall = math.max(secs(q(spark, small).count()), 0.25)
      val tLarge = secs(q(spark, large).count())
      val ratio = tLarge / tSmall
      info(f"$name: ${tSmall}%.2fs -> ${tLarge}%.2fs at 10x rows (${ratio}%.1fx)")
      assert(ratio < 25.0,
        f"$name grew ${ratio}%.1fx on 10x rows — quadratic-risk regression " +
          "(a bucketed plan should stay near-linear; ~100x means an unblocked pair join)")
    }
  }

  // Vector family (VERDICT r5 #6): embeddings grow 4x between these sf
  // tiers (500 -> 2,000 rows), so an UNBLOCKED all-pairs regression costs
  // ~16x in candidate volume on top of losing the label/bucket/cell
  // locality — the 12x wall-time bound leaves room for the label-blocked
  // designs' legitimate growth plus load noise while still catching a
  // label-ignoring pair join by an order of magnitude at any larger scale.
  // (l6/l7 exact are INTENTIONALLY block-quadratic; the guards cover the
  // ANN/dedup paths whose whole point is sub-quadratic candidates.)
  for ((name, q) <- Seq(
      "l6b_embed_dedup" -> VectorOps.l6bEmbedDedup,
      "l7b_knn_lsh" -> VectorOps.l7bKnnLsh,
      "l7c_knn_ivf" -> VectorOps.l7cKnnIvf,
      "l7d_knn_pq" -> VectorOps.l7dKnnPq,
      "l7f_knn_ivfpq" -> VectorOps.l7fKnnIvfPq,
      // SemDeDup's quadratic risk is ignoring the cluster blocking — the
      // within-cell pair join must track Σ cell²/2, not n²
      "l36_semdedup" -> VectorOps.l36SemDedup,
      // prototypicality pruning is window-per-cell (linear); a regression
      // to a global sort or a pair join shows up as super-linear growth
      "l37_proto_prune" -> VectorOps.l37ProtoPrune)) {
    test(s"$name: 4x embedding growth stays sub-quadratic in wall time") {
      // warm up BOTH tiers: quantizer training (l7c/l7d) memoizes per
      // source dir, so warming only the small tier would time the probe
      // path small but training+probe large — an asymmetry that reads as
      // growth. Training cost is driver-scale and pinned elsewhere.
      q(spark, small).count()
      q(spark, large).count()
      val tSmall = math.max(secs(q(spark, small).count()), 0.25)
      val tLarge = secs(q(spark, large).count())
      val ratio = tLarge / tSmall
      info(f"$name: ${tSmall}%.2fs -> ${tLarge}%.2fs at 4x rows (${ratio}%.1fx)")
      assert(ratio < 12.0,
        f"$name grew ${ratio}%.1fx on 4x rows — quadratic-risk regression " +
          "(blocked candidates should grow near-linearly; ~16x+ means an unblocked pair join)")
    }
  }
}
