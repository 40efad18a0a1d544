package graft

/** Pins the physical-plan SHAPE (shuffle-exchange count + join-strategy
  * choice, via [[PlanAudit]]) of the most expensive bench queries — the
  * top-10 plans of the r12 plan audit plus the four r13 additions
  * (q76's signature-collapse rewrite, q32/q65 dedup paths, q110 kernels). The timing bench would eventually
  * catch a plan regressing to an extra exchange or a broadcast join
  * falling back to SMJ, but only as an unattributed slowdown; this turns
  * the same regression into a named failure at the query that changed.
  *
  * Counts are the STATIC planner output at sf0.001 under the test session
  * (local[4], 4 shuffle partitions — same settings PlanCheck/probes use).
  * AQE can only improve on this shape at runtime. If a deliberate plan
  * change moves a count, update the table here WITH the reasoning — the
  * point is that it cannot move silently.
  *
  * Notes on the pinned values:
  *  - the broadcast_nested_loop_join=1 in q12/q73/q82 is the documented
  *    bounded-side crossJoin (one-row stats / bounds frame, broadcast);
  *  - q21's 7 broadcast joins are the PPJoin stats/threshold sides — the
  *    one SMJ is the candidate-verify self-join, which must shuffle;
  *  - q72's 5 exchanges are the fused (key, anchor) aggregate and orderBy
  *    range exchange plus the bounds aggregate and the two tiny
  *    spreadBounds round-robin repartitions protecting the explode
  *    consumers (see the table entry's r13/r16/r19 notes).
  */
class PlanShapeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val expected: Map[String, Map[String, Int]] = Map(
    "q21_dedup_jaccard" -> Map(
      "shuffle_exchange" -> 3, "broadcast_exchange" -> 7,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 7,
      "sort_merge_join" -> 1, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0),
    // 9 → 16 shuffles in r13 (spreadBounds round-robin per static bounds
    // reference — see git history), 16 → 10 in r16 tranche 1: the packed
    // segment kernel (AssignKernels.scala) generates the whole multi-spec
    // grid in ONE explode with in-kernel (w, koff) dedup, deleting the
    // per-spec union's 6 extra static bounds/spreadBounds subtrees AND the
    // segment table's full distinct() shuffle. 10 → 6 in r16 tranche 2:
    // the GRID CLAMP (e0 into AssignPacked) deletes the
    // assignment-join-segments filter — the fan-out's SMJ (the plan's only
    // sort of the row×window pairs at full width) is gone, the fused
    // aggregate runs directly on the explode with map-side partials, and
    // the W7 left join rides the aggregate's partitioning. 6 → 5 in r19:
    // the fused maskable-aggregate path (KeyedFeatures scaladoc) collapses
    // the per-(w, seg) aggregate, the segments⋈aggregate W7 left join and
    // the anchor pivot into ONE aggregate keyed (key, anchor) with the
    // segment grid union'd in as null-valued existence fillers — the W7
    // join's broadcast pair and one aggregate exchange are gone. The
    // remaining 5: fused-agg exchange, orderBy range exchange, bounds agg
    // exchange, and the two spreadBounds round-robins protecting the
    // explode consumers from AQE coalescing.
    "q72_keyed_multiwin" -> Map(
      "shuffle_exchange" -> 5, "broadcast_exchange" -> 1,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 1,
      "sort_merge_join" -> 0, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0),
    "q73_corpus_prep_fuzzy" -> Map(
      "shuffle_exchange" -> 7, "broadcast_exchange" -> 4,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 3,
      "sort_merge_join" -> 1, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 1, "cartesian_product" -> 0),
    "q79_wav_decode" -> Map(
      "shuffle_exchange" -> 2, "broadcast_exchange" -> 0,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 0,
      "sort_merge_join" -> 0, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0),
    // q89 (r18 bracket-targeted rank): the shape is COUNT-DEPENDENT by
    // design — in the selective regime (many partitions per key, the 100×
    // shape) a 4th broadcast+BHJ pair appears: the needed-segment
    // LEFT-SEMI prune keeping only the segments containing a quantile
    // bracket out of the window sort. At THIS spec's sf0.001 scale AQE
    // coalesces the range exchange to ~1 partition, the needed list
    // covers ≥70% of segments, and the counted degrade ranks directly —
    // the r17 3-BHJ shape below. Both regimes are row-pinned by
    // RankBracketsSpec (incl. the no-LeftSemi plan assert on the
    // degrade); shuffle count is 8 in both. The r18 histogram
    // pre-collapse (groupBy(key, metric, value).count() feeding the
    // weighted span core) sits UPSTREAM of the pid-pin localCheckpoint,
    // so its hash exchange is not part of this audited (post-pin) plan —
    // the audited shape is unchanged; the collapse is row-pinned by
    // SpanBracketsSpec instead.
    "q89_multi_quantiles" -> Map(
      "shuffle_exchange" -> 8, "broadcast_exchange" -> 3,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 3,
      "sort_merge_join" -> 1, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0),
    // q12 (r19, the same-source G3 fusion): the heavy-payload path is ONE
    // range exchange of the wide (idx, grp, values) frame + ONE
    // groupBy(__run) exchange + the contracted orderBy; everything else
    // the audit counts is the groupRunScan boundary machinery over
    // ≤ numPartitions-row summary tables, INLINE in this plan where the
    // generic shape hid it behind separately-materialized checkpoints:
    // the 4 NL joins are the two overPrev triangular prefix-combines,
    // the last-non-null-grp carry and the one-row gmax crossJoin — all
    // broadcast, all bounded by the partition count, none row-scaled
    // (the generic shape's 7-exchange count likewise excluded its
    // checkpoint-internal exchanges, which the fusion DELETED: two full
    // input scans, the 2n-row union exchange+pin and the segs⋈feats
    // SMJ are gone — plans/r19/q12_group_by_consecutive_{before,after}).
    "q12_group_by_consecutive" -> Map(
      "shuffle_exchange" -> 15, "broadcast_exchange" -> 9,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 5,
      "sort_merge_join" -> 1, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 4, "cartesian_product" -> 0),
    "q54_dup_clusters" -> Map(
      "shuffle_exchange" -> 2, "broadcast_exchange" -> 1,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 1,
      "sort_merge_join" -> 0, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0),
    "q82_asof_join" -> Map(
      "shuffle_exchange" -> 4, "broadcast_exchange" -> 2,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 1,
      "sort_merge_join" -> 0, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 1, "cartesian_product" -> 0),
    "q85_pack_per_split" -> Map(
      "shuffle_exchange" -> 3, "broadcast_exchange" -> 2,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 2,
      "sort_merge_join" -> 0, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0),
    "q99d_mse" -> Map(
      "shuffle_exchange" -> 3, "broadcast_exchange" -> 1,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 1,
      "sort_merge_join" -> 0, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0),
    // r13 additions: plans rewritten or newly heavy this round.
    //  - q76: the signature-collapse rewrite — the banded join's right
    //    side is broadcastable at this SF (1 BHJ, no SMJ); within-pairs
    //    and member fan-out are map-side; the at-scale SMJ path's
    //    single-shuffle exchange REUSE is locked separately by
    //    SimhashPairsSpec "plan hygiene" with broadcast disabled;
    //  - q32: hyperplane-LSH + Hamming-1 multiprobe bucket joins after the
    //    exact-dup pre-collapse — 6 SMJs over the probe-bucket unions is
    //    the audited shape (each is keyed on the bucket, never all-pairs);
    //  - q65: keep-one materializer — one hash-agg shuffle + one broadcast
    //    join back to the corpus;
    //  - q110: per-window KDE/gauss entropy kernels — one window-assign
    //    agg + one stats broadcast, plus (r17) the windowKeep gate's
    //    broadcast left-semi prune of the assigned rows (the second
    //    broadcast+BHJ pair): unkept big windows never reach the
    //    collect buffers or the O(n²) kernel. A SHUFFLE appearing beyond
    //    the two audited ones would mean the gate stopped broadcasting.
    // q76 (r18 contract): the pair stream ends in a 4-group checksum
    // aggregate instead of the global ORDER BY over every pair — the
    // groupBy(hamming) hash + orderBy(hamming) range exchanges each move
    // ≤4 ROWS (the partial agg collapses the 387M-pair fan-in map-side;
    // the r15-r17 shape's single range exchange moved the whole pair set).
    // r19: the signature-collapse `groups` frame is CHECKPOINTED (it feeds
    // the within-signature fan-out and the banded join — two
    // differently-shaped consumers that otherwise re-ran the scan +
    // simhash + collapse aggregate end to end), so its exchanges left the
    // audited consumer plan: 5 → 2 (the two ≤4-row contract exchanges).
    "q76_simhash_near" -> Map(
      "shuffle_exchange" -> 2, "broadcast_exchange" -> 1,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 1,
      "sort_merge_join" -> 0, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0),
    // q32 (r19 contract, the q76 precedent): the verified pair stream ends
    // in a per-cos-band checksum aggregate instead of the global ORDER BY
    // over every pair — the 14th exchange is the groupBy(cos_band) hash
    // step, and the final range exchange now moves the ≤10 band rows
    // rather than the whole intra-clique pair set (~50M rows at 100×).
    "q32_dedup_embed" -> Map(
      "shuffle_exchange" -> 14, "broadcast_exchange" -> 0,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 0,
      "sort_merge_join" -> 6, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0),
    "q65_dedup_keep_one" -> Map(
      "shuffle_exchange" -> 1, "broadcast_exchange" -> 1,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 1,
      "sort_merge_join" -> 0, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0),
    "q110_entropy_kde" -> Map(
      "shuffle_exchange" -> 2, "broadcast_exchange" -> 2,
      "reused_exchange" -> 0, "broadcast_hash_join" -> 2,
      "sort_merge_join" -> 0, "shuffled_hash_join" -> 0,
      "broadcast_nested_loop_join" -> 0, "cartesian_product" -> 0))

  // computed shapes cached by the per-query tests so the invariant test
  // below asserts against REALITY (not the expectation table, which a
  // future table edit could weaken)
  private val observed =
    scala.collection.mutable.Map.empty[String, Map[String, Int]]

  for ((name, want) <- expected.toSeq.sortBy(_._1)) {
    test(s"$name physical plan keeps its audited shape") {
      val df = SparkEntry.queries(name)(spark, dir)
      val got = PlanAudit.shape(df)
      observed(name) = got
      assert(got == want,
        s"\n  expected: ${PlanAudit.render(want)}\n  actual:   ${PlanAudit.render(got)}")
    }
  }

  test("the expectation table covers exactly the shared pinned-plan set") {
    // PlanAudit.PinnedPlans is the single source the amplifier spec and
    // the at-scale probe iterate — a plan added to one audit surface must
    // be added to all of them, and this assertion is where the drift fails
    assert(expected.keySet == PlanAudit.PinnedPlans.toSet,
      s"table-only: ${expected.keySet -- PlanAudit.PinnedPlans.toSet}; " +
        s"pinned-only: ${PlanAudit.PinnedPlans.toSet -- expected.keySet}")
  }

  // registered after (and so runs after) the per-query tests above
  test("no audited plan uses a cartesian product or unplanned NL join") {
    // assume, not assert: a filtered run (testOnly -- -z q76) computes a
    // subset of shapes — cancel the full-set invariant then instead of
    // failing it; full runs (sbt test, the gate) still enforce it
    assume(observed.size == expected.size,
      s"only ${observed.size}/${expected.size} shapes computed (filtered run?)")
    for ((name, got) <- observed) {
      assert(got("cartesian_product") == 0, name)
      // q12's 4 NL joins are the fused groupRunScan's summary-table
      // prefix-combines (bounded by the PARTITION count, broadcast,
      // never row-scaled — see the table entry's r19 note); every other
      // audited plan stays at the documented ≤1 bounded crossJoin
      val nlAllowed = if (name == "q12_group_by_consecutive") 4 else 1
      assert(got("broadcast_nested_loop_join") <= nlAllowed, name)
    }
  }
}
