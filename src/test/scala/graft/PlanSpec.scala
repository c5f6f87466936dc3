package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan properties — the 100 TB posture checked mechanically.
  * These run analysis/planning only (no execution; exception: q_funnel's
  * lazy stage checkpoints still materialize their shuffles under AQE at
  * construction — small, accepted), so covering every declared query is
  * cheap. */
class PlanSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no query plans a CartesianProduct (all cross joins broadcast)") {
    val offenders = SparkEntry.queries.keys.filter { q =>
      plan(q).contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    Seq("q_ts_rollup_avg", "q_ts_rollup_sum", "q_join_inner",
      "q_agg_distinct", "q_llm_text_stats", "q_ts_summarize",
      "q_ts_series_ratio", "q_ts_glob_fetch", "q_join_full",
      "q_ts_max_series", "q_ts_hitcount", "q_ts_sort_by_total",
      "q_agg_benford", "q_ts_acf", "q_ts_pacf", "q_ts_apply_bynode",
      "q_ts_trimmed_mean", "q_pareto_abc", "q_activity_histogram",
      "q_rfm_segments").foreach { q =>
      val p = plan(q)
      // rollup-archive readers (r17): the shared hourlyAvg memo hides
      // the aggregate behind its checkpoint — inspect the archive's own
      // pre-checkpoint relation (the standing localCheckpoint rule).
      // The fallback is GATED on the checkpoint marker (r17 advice): a
      // non-archive query that lost its partial aggregation must fail
      // here, not pass via the archive probe.
      val probe = if (p.contains("partial_")) p
        else {
          assert(p.contains("ExistingRDD"),
            s"$q has no partial aggregation and no checkpoint hiding one:\n$p")
          graft.ts.TimeSeriesOps.hourlyAvgRelation(spark, sf)
            .queryExecution.executedPlan.toString
        }
      assert(probe.contains("partial_"),
        s"$q has no partial aggregation:\n$probe")
    }
  }

  test("SimHashAgg partial-aggregates (map-side combine of vote buffers)") {
    // the declared query checkpoints the signature index, so inspect the
    // signature relation's own plan (what actually executes to build it)
    val p = graft.llm.TextOps.simhashSigs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_simhash_agg"),
      s"simhash signature agg should be partial:\n$p")
  }

  test("gram_sums partial-aggregates: the PCA scatter feed shuffles " +
      "one fixed buffer per partition, never N*d^2 joined rows") {
    import org.apache.spark.sql.functions.col
    val p = graft.io.Tables.embeddings(spark, sf)
      .agg(graft.functions.GramSums(col("embedding"), 64).as("g"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_gram_sums"),
      s"gram_sums must map-side combine:\n$p")
    assert(!p.contains("Join"), s"scatter feed must not join:\n$p")
  }

  test("heavy_hitters partial-aggregates: the shuffle carries summaries") {
    val p = plan("q_llm_heavy_hitters")
    assert(p.contains("partial_heavy_hitters"),
      s"heavy_hitters must map-side combine (shuffle = one <=capacity " +
        s"summary per lang x partition, never the token stream):\n$p")
  }

  test("cm_sketch partial-aggregates: the shuffle carries fixed grids") {
    import org.apache.spark.sql.functions.col
    val p = graft.io.Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(graft.functions.CmSketch(col("source"), 4, 64).as("sk"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_cm_sketch"),
      s"cm_sketch must map-side combine (shuffle = one depth x width " +
        s"grid per group x partition, never the item stream):\n$p")
  }

  test("global top-k uses TakeOrderedAndProject, not a full sort") {
    Seq("q_ts_topk_series", "q_sort_limit", "q_scan_project",
      "q_llm_cosine_topk", "q_ts_most_deviant").foreach { q =>
      assert(plan(q).contains("TakeOrderedAndProject"),
        s"$q does a full global sort for a limited result")
    }
  }

  test("events scan prunes to the referenced columns only") {
    // q_ts_rollup_avg reads the shared hourlyAvg archive (r17); the
    // events scan lives in the archive's pre-checkpoint relation
    val p = graft.ts.TimeSeriesOps.hourlyAvgRelation(spark, sf)
      .queryExecution.executedPlan.toString
    val schema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(schema.split(",").length == 3, s"expected 3 columns, got: $schema")
  }

  test("dimension joins broadcast (nation/part/grid side)") {
    Seq("q_join_inner", "q_join_broadcast", "q_ts_gapfill").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q should broadcast its small side")
    }
  }

  test("star join: date filter pushes into the orders scan, dims broadcast") {
    val p = plan("q_star_revenue")
    assert(p.contains("BroadcastHashJoin"),
      s"nation/customer dims should broadcast:\n$p")
    // the selective o_orderdate range must reach the parquet reader —
    // at 100 TB this is the partition-pruning predicate
    assert("PushedFilters: \\[[^\\]]*o_orderdate[^\\]]*GreaterThanOrEqual".r
        .findFirstIn(p).isDefined ||
      "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(o_orderdate".r
        .findFirstIn(p).isDefined,
      s"o_orderdate range not pushed to the orders scan:\n$p")
  }

  test("split and chunk are map-side: no hash-partition shuffle") {
    // the only Exchange allowed is the rangepartitioning of the final
    // deterministic orderBy — the computation itself must not shuffle
    Seq("q_llm_split", "q_llm_chunk").foreach { q =>
      val p = plan(q)
      assert(!p.contains("hashpartitioning"),
        s"$q should be a pure map-side pipeline:\n$p")
    }
  }

  test("funnel stages: no cartesian product behind the lazy checkpoints") {
    // localCheckpoint hides stage internals from the all-queries sweep
    // (checkpoints truncate lineage) — inspect the pre-checkpoint plans directly
    graft.ts.TimeSeriesOps.funnelStages(spark, sf)._2.foreach { st =>
      val p = st.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"cartesian in stage:\n$p")
    }
  }

  test("sessionize: both windows and the final agg share ONE shuffle") {
    val p = plan("q_sessionize")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 1, s"expected a single user_id exchange, got $n:\n$p")
  }

  test("scd2 PIT join: two user-key window exchanges, no theta join") {
    // the as-of union-window form must never plan the version-interval
    // range join (SMJ/BNLJ on a non-equi predicate) — two hash
    // exchanges (dim compression window + union LOCF window), both on
    // user_id, are the entire shuffle story
    val p = plan("q_rel_scd2_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"theta join in PIT join:\n$p")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 2, s"expected 2 user-key exchanges, got $n:\n$p")
  }

  test("ks drift: histograms aggregate partially; sup runs on distinct values") {
    // the value histograms must partial-aggregate (the raw scan never
    // reaches the window) and the only nested-loop join is the
    // broadcast of the 4-row type list onto the baseline histogram
    val p = plan("q_agg_ks_drift")
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"type fan-out must ride a broadcast:\n$p")
  }

  test("lttb: three key exchanges only (hour, day, series grains)") {
    val p = plan("q_ts_lttb")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 3, s"expected <=3 grain exchanges, got $n:\n$p")
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("kcore peel rounds: semi joins stay equi, no cartesian") {
    // localCheckpoint truncates lineage in the all-queries sweep —
    // build one un-checkpointed peel round and inspect it directly
    import org.apache.spark.sql.functions._
    val sym = graft.io.Tables.lineitem(spark, sf)
      .where(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("src"))
      .select(col("src"), (col("src") + 1).as("dst"))
    val alive = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .where(col("d") >= 3).select(col("src").as("n"))
    val peeled = sym
      .join(alive.select(col("n").as("src")), Seq("src"), "left_semi")
      .join(alive.select(col("n").as("dst")), Seq("dst"), "left_semi")
    val p = peeled.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"peel round plans a non-equi join:\n$p")
  }

  test("routed fetch pushes the metric predicate into the points scan") {
    val p = plan("q_ts_fetch_bounded")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(event_type".r
        .findFirstIn(p).isDefined ||
      p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type"),
      s"metric equality not pushed into the scan:\n$p")
  }

  test("budget_sample: the lang window's shuffle serves the final agg") {
    val p = plan("q_llm_budget_sample")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 1, s"expected one lang exchange (window+agg shared), got $n:\n$p")
    val schema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(schema.split(",").length == 3,
      s"documents scan should read 3 columns, got: $schema")
  }

  test("pack: documents scan prunes to 3 columns; partial agg after window") {
    val p = plan("q_llm_pack")
    val schema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(schema.split(",").length == 3,
      s"documents scan should read (doc_id, source, text), got: $schema")
    assert(p.contains("partial_"), s"pack report agg should be partial:\n$p")
  }

  test("lm_novelty: the bigram model joins by broadcast, never shuffled") {
    val p = plan("q_llm_lm_novelty")
    assert(p.contains("BroadcastHashJoin"),
      s"model join must broadcast:\n$p")
  }

  test("upsert snapshot merges with NO join — one hash aggregate does it") {
    val p = plan("q_upsert_snapshot")
    assert(!p.contains("Join"), s"latest-wins merge must not join:\n$p")
    assert(p.contains("partial_"), s"merge agg should be partial:\n$p")
  }

  test("mad outliers: one event_type exchange serves all window passes") {
    val p = plan("q_ts_mad_outliers")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    // the rollup shuffle lives in the shared hourlyAvg archive (r17,
    // checkpoint-hidden here); ONE event_type exchange must serve all
    // the rank/median/dev/mad window passes
    assert(n == 1, s"expected one hash exchange, got $n:\n$p")
  }

  test("cohort retention: distinct's exchange is reused by the window") {
    val p = plan("q_cohort_retention")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    // distinct on (user_id, d) + the (cohort, offset) matrix agg; the
    // user_id window must NOT add a third
    assert(n <= 3, s"expected <= 3 hash exchanges, got $n:\n$p")
  }

  test("linreg: window partitioning is reused by the moment aggregate") {
    val p = plan("q_ts_linreg")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    // the rollup shuffle lives in the shared hourlyAvg archive (r17,
    // checkpoint-hidden here); the window shuffle on event_type must be
    // the only one left — the final moment aggregate rides it
    assert(n == 1, s"expected one hash exchange, got $n:\n$p")
  }

  test("tpch revchange: every predicate pushes into the lineitem scan") {
    val p = plan("q_tpch_revchange")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(s"PushedFilters: \\[[^\\]]*$c".r.findFirstIn(p).isDefined,
        s"$c not pushed to the scan:\n$p")
    }
    assert(!p.contains("Exchange hashpartitioning"),
      s"scan-side query should have no hash shuffle:\n$p")
  }

  test("tpch localvolume: all three dims ride broadcast joins") {
    val p = plan("q_tpch_localvolume")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 3, s"expected >=3 broadcast joins (supplier/nation/region), got $n:\n$p")
  }

  test("tpch shippriority: top-10 is TakeOrdered; filters reach scans") {
    val p = plan("q_tpch_shippriority")
    assert(p.contains("TakeOrderedAndProject"),
      s"limit 10 should be TakeOrderedAndProject:\n$p")
    Seq("l_shipdate", "o_orderdate", "c_mktsegment").foreach { c =>
      assert(s"PushedFilters: \\[[^\\]]*$c".r.findFirstIn(p).isDefined,
        s"$c not pushed to its scan:\n$p")
    }
  }

  test("segment dedup: span index aggregates partially; join is hash-equi") {
    val p = plan("q_llm_segment_dedup")
    assert(p.contains("partial_"), s"frequency agg not map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"join-back must stay a hash equi-join:\n$p")
  }

  test("tpch custdist: both aggregate levels partial; left join stays hash") {
    val p = plan("q_tpch_custdist")
    assert(p.contains("partial_"), s"per-customer count not map-side:\n$p")
    assert(!p.contains("BroadcastNestedLoop"), s"left join degraded:\n$p")
  }

  test("tpch nationpairs: pair-filtered supplier broadcasts; agg partial") {
    val p = plan("q_tpch_nationpairs")
    assert(p.contains("BroadcastHashJoin"),
      s"supplier dim should broadcast:\n$p")
    assert(p.contains("partial_"), s"pair-year agg not map-side:\n$p")
  }

  test("tpch qtyoutlier: join-back is a hash equi-join on partkey") {
    val p = plan("q_tpch_qtyoutlier")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"aggregate join-back must stay equi:\n$p")
    assert(p.contains("partial_"), s"per-part avg not map-side:\n$p")
  }

  test("tpch waiting: the three windows share ONE orderkey exchange") {
    val p = plan("q_tpch_waiting")
    // the (l_orderkey, l_suppkey) pre-aggregate exchange is a DIFFERENT
    // partitioning (map-side combine before the narrower shuffle) — count
    // only orderkey-ONLY exchanges, which the three window specs share
    val exchanges = "Exchange hashpartitioning\\(l_orderkey#\\d+L, \\d".r
      .findAllIn(p).size
    assert(exchanges <= 1,
      s"window trio should reuse the orderkey partitioning ($exchanges):\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 should be TakeOrdered:\n$p")
  }

  test("tpch redsupp: the shortlist reaches supplier as a LEFT SEMI") {
    val p = plan("q_tpch_redsupp")
    assert(p.toLowerCase.contains("leftsemi"),
      s"supplier shortlist should be a semi join:\n$p")
  }

  test("collocations: vocab joins broadcast; counts partial; top-20 TakeOrdered") {
    val p = plan("q_llm_collocations")
    assert(p.contains("BroadcastHashJoin"), s"unigram model must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffled join expected:\n$p")
    assert(p.contains("partial_"), s"counting aggs not map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not TakeOrdered:\n$p")
  }

  test("tfidf: df comes from the term window, not a self-join") {
    val p = plan("q_llm_tfidf")
    assert(!p.contains("SortMergeJoin"),
      s"document frequency must not self-join:\n$p")
    assert(p.contains("partial_"), s"(doc,term) agg not map-side:\n$p")
  }

  test("attribution: one user_id window, no self-join, final agg partial") {
    val p = plan("q_attribution")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"attribution must be join-free (window LOCF):\n$p")
    assert(p.contains("partial_"), s"rollup not map-side:\n$p")
  }

  test("burn rate: the range window runs over the hourly pre-aggregate") {
    val p = plan("q_ts_burn_rate")
    assert(p.contains("partial_"), s"hourly pre-agg not map-side:\n$p")
  }

  test("source overlap: boilerplate cap bounds the self-join; aggs partial") {
    val p = plan("q_llm_source_overlap")
    assert(p.contains("partial_"), s"span frequency agg not map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"pairing must stay a hash equi-join on the span hash:\n$p")
  }

  test("embed diversity: shuffle carries (label x d) partials, not vectors") {
    val p = plan("q_llm_embed_diversity")
    assert(p.contains("partial_"), s"per-dimension sums not map-side:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian allowed:\n$p")
  }

  test("tpch topsupplier: the argmax threshold rides a broadcast, fact scans once") {
    val p = plan("q_tpch_topsupplier")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"1-row max should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian allowed:\n$p")
  }

  test("tpch dormant: anti join on the date-shrunk orders side") {
    val p = plan("q_tpch_dormant")
    assert(p.contains("LeftAnti"), s"no-recent-orders should plan as LeftAnti:\n$p")
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(p).isDefined,
      s"date bound not pushed to the orders scan:\n$p")
  }

  test("tpch orderpriority: plans a LEFT SEMI join, no fact payload") {
    val p = plan("q_tpch_orderpriority")
    assert(p.contains("LeftSemi"), s"exists should plan as LeftSemi:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(p).isDefined,
      s"l_returnflag not pushed to the lineitem scan:\n$p")
  }

  test("tpch promo: part side broadcasts; shipdate bounds reach the scan") {
    val p = plan("q_tpch_promo")
    assert(p.contains("BroadcastHashJoin"), s"part join should broadcast:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      s"l_shipdate bounds not pushed to the lineitem scan:\n$p")
  }

  test("tpch bigorders: HAVING pre-agg is partial; top-50 is TakeOrdered") {
    val p = plan("q_tpch_bigorders")
    assert(p.contains("partial_"), s"quantity pre-agg not map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"limit 50 should be TakeOrderedAndProject:\n$p")
  }

  test("tpch disjunctive: implied envelopes reach both scans") {
    val p = plan("q_tpch_disjunctive")
    assert("PushedFilters: \\[[^\\]]*p_brand".r.findFirstIn(p).isDefined,
      s"brand envelope not pushed to the part scan:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(p).isDefined,
      s"quantity envelope not pushed to the lineitem scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"pre-filtered part should broadcast:\n$p")
  }

  test("tpch returned: top-20 is TakeOrdered; returnflag reaches the scan") {
    val p = plan("q_tpch_returned")
    assert(p.contains("TakeOrderedAndProject"),
      s"limit 20 should be TakeOrderedAndProject:\n$p")
    assert("PushedFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(p).isDefined,
      s"l_returnflag not pushed to the lineitem scan:\n$p")
  }

  test("tpch pricing: single partial-agg pass, pruned fact scan") {
    val p = plan("q_tpch_pricing")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
    // the 7-column pruned schema can exceed the plan-string line cap, so
    // assert on the (always visible) head of the ReadSchema instead of
    // counting fields: pruning failed iff the file-order first column
    // l_orderkey survives into the scan schema
    val schema = "ReadSchema: ([^\n]*)".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(schema.contains("l_quantity") && !schema.contains("l_orderkey"),
      s"lineitem scan not pruned: $schema")
  }

  test("bpe family: word-map joins broadcast, aggregates partial") {
    // token_count still joins the word map in its own plan; the
    // encode/chunk/pack/mix family consumes the tokenize-once memo,
    // whose checkpoint hides the join (lineage truncation) — so the memo
    // BUILDER's plan carries the assertion for them
    Seq("q_llm_bpe_token_count").foreach { q =>
      val p = plan(q)
      // the distinct-word -> n_sub map is vocabulary-sized: it must ride
      // a broadcast join, never shuffle the exploded corpus against it
      assert(p.contains("BroadcastHashJoin"),
        s"$q should broadcast the word map:\n$p")
      assert(p.contains("partial_"), s"$q has no map-side combine:\n$p")
    }
    val builder = graft.llm.BpeOps.encodedDocsPlanProbe(spark, sf)
      .queryExecution.executedPlan.toString
    assert(builder.contains("BroadcastHashJoin"),
      s"the encode builder should broadcast the word map:\n$builder")
    assert(builder.contains("partial_"),
      s"the encode builder has no map-side combine:\n$builder")
  }

  test("gopher rules: a pure map-side gate — no hash-partition shuffle") {
    // every rule is an array fold over the token split; the only
    // Exchange allowed is the rangepartitioning of the final orderBy
    val p = plan("q_llm_gopher_rules")
    assert(!p.contains("hashpartitioning"),
      s"quality gate should not shuffle:\n$p")
  }

  test("domain mix: aggs partial; the 1-row corpus total rides a broadcast") {
    val p = plan("q_llm_domain_mix")
    assert(p.contains("partial_"), s"per-source agg not map-side:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"the scalar corpus total should broadcast, not shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in domain mix:\n$p")
  }

  test("lsh tradeoff: band-bucket equi-joins only, pairs verified by hash join") {
    // the checkpoints hide the shingle/signature builders from this plan
    // (checkpoints hide upstream plans) — what remains IS the join topology under test:
    // candidate generation must join on (bands, band, sig[, lang]) and
    // pair verification on doc_id, never a cross product
    val p = plan("q_llm_lsh_tradeoff")
    assert(!p.contains("CartesianProduct"),
      s"lsh tradeoff must never plan all-pairs:\n$p")
    assert(p.contains("sig"), s"candidate join lost the band signature key:\n$p")
  }

  test("embed_neardup: hot buckets drop via a broadcast anti-join") {
    // the r10 cap: candidate generation must carry the one-sided
    // LeftAnti against the (small, broadcast) hot-bucket list — the
    // shape that bounds pair fanout when bucket occupancy grows with
    // the corpus
    val p = plan("q_llm_embed_neardup")
    assert(p.contains("LeftAnti"), s"no anti-join cap:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"hot list must broadcast:\n$p")
  }

  test("jaccard capped: skew-gated — hubless fixture plans NO hub " +
      "machinery; a forced tight cap plans the anti-join split") {
    // r18 skew gate (guide §2.5): with max(degree) <= cap the hub
    // branch never plans — the fixture graph has no degree-64 hubs, so
    // the default-cap plan must be the plain wedge join (no LeftAnti,
    // no capped-list window), while a cap BELOW the fixture max degree
    // must still plan the full r12 two-phase split
    val p = plan("q_part_jaccard_capped")
    assert(!p.contains("LeftAnti"),
      s"hubless graph should skip the hub branch:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    val tight = graft.rel.RelationalOps
      .partJaccardCapped(spark, sf, cap = 1)
      .queryExecution.executedPlan.toString
    assert(tight.contains("LeftAnti"),
      s"tight cap must plan the hub-only-pairs anti join:\n$tight")
    assert(!tight.contains("CartesianProduct"), s"cartesian in:\n$tight")
    import org.apache.spark.sql.functions._
    val e = graft.io.Tables.lineitem(spark, sf)
      .where(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val sym = e.select(col("l_partkey").as("src"),
      col("l_orderkey").as("dst"))
    val hubs = sym.groupBy("src").count().where(col("count") > 2)
      .select(col("src").as("hub"))
    val split = sym.join(hubs, sym("src") === hubs("hub"), "left_semi")
      .queryExecution.executedPlan.toString
    assert(split.contains("LeftSemi"),
      s"the hub split is a semi join pre-checkpoint:\n$split")
  }

  test("resource-alloc capped: skew-gated hub branch; no cartesian") {
    // same skew gate as the jaccard twin: hubless default-cap plan has
    // no hub machinery, a forced tight cap plans the anti-join split
    val p = plan("q_part_resource_alloc_capped")
    assert(!p.contains("LeftAnti"),
      s"hubless graph should skip the hub branch:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    val tight = graft.rel.RelationalOps
      .partResourceAllocCapped(spark, sf, cap = 1)
      .queryExecution.executedPlan.toString
    assert(tight.contains("LeftAnti"),
      s"tight cap must plan the hub-only-pairs anti join:\n$tight")
    assert(!tight.contains("CartesianProduct"), s"cartesian in:\n$tight")
  }

  test("pref-attach capped: skew-gated hub branch; no cartesian") {
    // third member of the skew-gated family (jaccard, RA, PA)
    val p = plan("q_part_pref_attach_capped")
    assert(!p.contains("LeftAnti"),
      s"hubless graph should skip the hub branch:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    val tight = graft.rel.RelationalOps
      .partPrefAttachCapped(spark, sf, cap = 1)
      .queryExecution.executedPlan.toString
    assert(tight.contains("LeftAnti"),
      s"tight cap must plan the hub-only-pairs anti join:\n$tight")
    assert(!tight.contains("CartesianProduct"), s"cartesian in:\n$tight")
  }

  test("anova/brown-forsythe: moment aggs are partial; the k-row " +
      "total rides a broadcast") {
    Seq("q_agg_anova", "q_agg_brown_forsythe").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_"), s"$q moment agg not partial:\n$p")
      assert(p.contains("BroadcastNestedLoop") ||
        p.contains("BroadcastHashJoin"),
        s"$q total row must broadcast:\n$p")
    }
  }

  test("cliffs delta: dominance agg is partial in the visible plan; " +
      "the pre-checkpoint fan-out broadcasts its group side and " +
      "windows over the histogram") {
    import org.apache.spark.sql.functions._
    val p = plan("q_agg_cliffs_delta")
    assert(p.contains("partial_"), s"dominance agg not partial:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // the checkpoint truncates the cums lineage (standing PlanSpec
    // lesson) — probe the same pre-checkpoint shape inline
    val byGV = graft.io.Tables.events(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type").as("g"), col("value").as("v"))
      .agg(count(lit(1)).as("c"))
    val probe = byGV.select(col("v")).distinct()
      .crossJoin(broadcast(byGV.select(col("g")).distinct()))
      .join(byGV, Seq("g", "v"), "left")
      .withColumn("cum",
        sum(col("c")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("v"))))
      .queryExecution.executedPlan.toString
    assert(probe.contains("Window"), s"no cumulative window:\n$probe")
    assert(probe.contains("BroadcastNestedLoop") ||
      probe.contains("BroadcastHashJoin"),
      s"group fan-out must broadcast:\n$probe")
    assert(!probe.contains("CartesianProduct"), s"cartesian in:\n$probe")
  }

  test("rank-stat distributed twins plan NO window anywhere (the " +
      "dominance/dispersion/median/trend scale path)") {
    // a Window node in any of these would reintroduce exactly the
    // single-partition-per-group sort the twins exist to remove; the
    // walks are mapPartitions over a range layout, the tails plain
    // aggregates + broadcast joins. The checkpoints can only HIDE
    // upstream operators, and every pre-checkpoint relation here is a
    // scan→filter→agg shape with no window either (asserted via the
    // un-checkpointed histogram probes below).
    Seq("q_agg_jonckheere_dist", "q_agg_ansari_bradley_dist",
      "q_agg_mood_median_dist", "q_agg_page_trend_dist").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window"), s"$q plans a window:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q cartesian:\n$p")
    }
    import org.apache.spark.sql.functions._
    // pre-checkpoint histogram shapes: partial agg, no window
    val hist = graft.io.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("g"), col("o_totalprice").as("v"))
      .agg(count(lit(1)).as("c"))
      .queryExecution.executedPlan.toString
    assert(hist.contains("partial_") && !hist.contains("Window"),
      s"histogram feed must be a partial agg, window-free:\n$hist")
  }

  test("hits: a round's in-sum is partial and the fused literal " +
      "normalizer plans NO join (pre-checkpoint probe)") {
    import org.apache.spark.sql.functions._
    // the per-round checkpoints truncate lineage in q_part_hits's
    // final plan — probe one round's exact shape inline. Since the
    // r14 fusion the scalar max comes back as a driver literal, so
    // normalization is a bare projection: the round's only joins are
    // the edge joins, and each side is ONE job.
    val o = graft.io.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("c"))
    val l = graft.io.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s"))
    val edges = o.join(l, "ok").select(col("c"), col("s")).distinct()
    val h = edges.select(col("c")).distinct()
      .withColumn("h", lit(1000000L))
    val ar = edges.join(h, "c").groupBy(col("s"))
      .agg(sum(col("h")).as("ar"))
    val p = ar.select(col("s"), expr("(ar * 1000000L) div 2000000L").as("a"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_"), s"in-sum agg not partial:\n$p")
    assert(!p.contains("BroadcastNestedLoop") &&
      !p.contains("CartesianProduct"),
      s"literal normalization must not plan a scalar join:\n$p")
  }

  test("rake: word stats are partial in the visible plan; the " +
      "pre-checkpoint phrase ids ride a per-doc window") {
    import org.apache.spark.sql.functions._
    val p = plan("q_llm_rake_keywords")
    assert(p.contains("partial_"), s"word stats not partial:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // pre-checkpoint probe of the phrase-id window shape
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val probe = graft.io.Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .withColumn("pid",
        sum(when(col("w").isin("a", "the"), 1L).otherwise(0L)).over(w))
      .queryExecution.executedPlan.toString
    assert(probe.contains("Window"), s"no per-doc window:\n$probe")
  }

  test("label-prop/modularity: the argmax window runs at label grain " +
      "(over the count aggregate), not edge grain") {
    import org.apache.spark.sql.functions._
    // pre-checkpoint probe of one LPA round: the row_number argmax
    // must consume the (dst, label) COUNT relation — a raw-edge-grain
    // window would show Window with no upstream aggregate
    val e = graft.io.Tables.lineitem(spark, sf)
      .where(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
    val labels = e.select(col("dst").as("node"),
      col("dst").as("lbl")).distinct()
    val cnt = e.join(labels, e("src") === labels("node"))
      .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst")).orderBy(col("c").desc, col("lbl"))
    val p = cnt.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count"),
      s"count aggregate must be partial:\n$p")
    assert(p.indexOf("Window") < p.indexOf("HashAggregate") ||
      "(?s)Window.*HashAggregate".r.findFirstIn(p).isDefined,
      s"window should consume the aggregate:\n$p")
  }

  test("granger: the 13-moment aggregate is one partial pass") {
    val p = plan("q_ts_granger")
    assert(p.contains("partial_"), s"moment agg not partial:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("ks_by_source: the rank window runs on the histogram, not raw docs") {
    // one (source, n_chars) aggregate feeds everything; the cumulative
    // window's input is the fanned-out histogram grid — a raw-row sort
    // would show a window with no upstream partial aggregate
    val p = plan("q_agg_ks_by_source")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"histogram aggregate must be partial:\n$p")
    assert("(?s)Window.*HashAggregate".r.findFirstIn(p).isDefined ||
      p.indexOf("Window") > p.indexOf("HashAggregate"),
      s"window should consume the aggregate:\n$p")
  }

  test("shapley: lattice joins ride broadcasts; counting agg is partial") {
    val p = plan("q_attr_shapley")
    assert(p.contains("BroadcastNestedLoop") ||
      p.contains("BroadcastHashJoin"),
      s"the 16-cell lattice must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("shapley cohort: per-week lattice still rides broadcasts") {
    val p = plan("q_attr_shapley_cohort")
    assert(p.contains("BroadcastNestedLoop") ||
      p.contains("BroadcastHashJoin"),
      s"the 16 x weeks lattice must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("spearman: rank windows run on value-grain histograms, not raw") {
    val p = plan("q_agg_spearman")
    assert(p.contains("partial_"),
      s"histogram aggregates must be partial:\n$p")
    assert(p.contains("Window") && p.contains("HashAggregate"),
      s"rank windows must consume the histogram aggregate:\n$p")
  }

  test("tv family: histogram-grain sums are partial; no cartesian") {
    // the broadcast baseline fan-out lives UPSTREAM of the merged
    // grid's localCheckpoint (plan-visibility rule — same as the
    // jaccard split), so the visible plan is judged on the exact-sum
    // aggregation shape; the fan-out broadcast is asserted on the
    // pre-checkpoint construction below
    for (q <- Seq("q_agg_tv_drift", "q_agg_tv_by_source")) {
      val p = plan(q)
      assert(p.contains("partial_"), s"$q: no partial aggregation:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian:\n$p")
    }
    import org.apache.spark.sql.functions._
    val base = graft.io.Tables.events(spark, sf)
      .where(col("event_type") === "view")
      .groupBy(col("value")).agg(count(lit(1)).as("c2"))
    val types = graft.io.Tables.events(spark, sf)
      .select(col("event_type").as("t")).distinct()
    val fan = broadcast(types).crossJoin(base)
      .queryExecution.executedPlan.toString
    assert(fan.contains("BroadcastNestedLoop") ||
      fan.contains("BroadcastHashJoin"),
      s"baseline fan-out must broadcast the type list:\n$fan")
  }

  test("logrank: dur x group grid fan-out broadcasts; no cartesian") {
    val p = plan("q_surv_logrank")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoop"),
      s"grid fan-out must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("tpch completion five: dims broadcast, date filter pushed") {
    Seq("q_tpch_mincost", "q_tpch_profit", "q_tpch_suppcnt").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q should broadcast its dimension side")
    }
    val p = plan("q_tpch_priorityclass")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined ||
      "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate".r
        .findFirstIn(p).isDefined,
      s"l_shipdate range not pushed to the lineitem scan:\n$p")
  }
}
