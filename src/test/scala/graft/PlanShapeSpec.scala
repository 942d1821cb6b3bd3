package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the properties that make these queries
  * scale are asserted, not just spot-audited — filters reach the scans,
  * small dimensions broadcast, top-1 windows take the group-limit path,
  * and no similarity pairing ever degenerates to an unblocked product.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("plan-shape-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("scan-filter-project pushes filters and prunes columns") {
    val p = plan("q_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag)")
      || p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "filters should reach the parquet scan")
    assert(!p.contains("l_comment"), "unused columns should be pruned")
    assert(p.contains("*("), "whole-stage codegen expected")
  }

  test("multi-join agg broadcasts the small dimension") {
    val p = plan("q_equi_join_agg")
    assert(p.contains("BroadcastHashJoin"), "nation should broadcast")
  }

  test("top-1 window takes the WindowGroupLimit path") {
    val p = plan("q_window_top1")
    assert(p.contains("WindowGroupLimit"),
      "rank<=1 filter should push a group limit below the window")
  }

  test("containment theta-join is a broadcast BNLJ (tiny build side)") {
    val p = plan("q_contains_theta_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "theta join should be BNLJ with the broadcast word list")
  }

  test("semi/anti joins plan as semi/anti, not inner + dedup") {
    assert(plan("q_semi_join").contains("LeftSemi"))
    assert(plan("q_anti_join").contains("LeftAnti"))
  }

  test("similarity pairings never degenerate to an unblocked product") {
    // every LSH/banded path must join on a blocking key; only the
    // documented exact baselines (q_sim_topk, q_emb_near_pairs) may cross
    for (q <- Seq("q_dedup_minhash", "q_dedup_simhash", "q_ann_topk",
        "q_ngram_jaccard_pairs", "q_emb_near_pairs_lsh", "q_hamming_pairs",
        "q_image_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ")
    }
  }

  test("sorted limit plans as TakeOrderedAndProject (no full sort)") {
    assert(plan("q_orderby_limit").contains("TakeOrderedAndProject"))
  }

  test("range join is a binned equi-join, not a nested loop") {
    val p = plan("q_range_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "interval containment must join on (keys, bin), not a product")
    val p2 = plan("q_interval_overlap")
    assert(!p2.contains("CartesianProduct") &&
      !p2.contains("BroadcastNestedLoopJoin"),
      "interval overlap must join on (keys, bin), not a product")
  }

  test("dedup-cluster pair stage joins on the df-capped shingle key") {
    val p = plan("q_dedup_clusters")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "pair generation must stay an equi-join on the shingle hash")
  }

  test("tfidf and doc encoding stay equi-join dataflows") {
    for (q <- Seq("q_tfidf", "q_encode_docs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("cube and sliding window expand INSIDE one aggregation pass") {
    // both rely on Expand (grouping-set lattice / per-window fan-out)
    // feeding a single partial-agg-friendly aggregate — not a self-union
    // of scans and not one shuffle per grouping set
    for (q <- Seq("q_cube", "q_sliding_window")) {
      val p = plan(q)
      assert(p.contains("Expand"), s"$q should fan out via Expand")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 2, // the agg shuffle (+1 scan rebalance)
        s"$q should aggregate in one pass, saw $exchanges exchanges")
    }
  }

  test("salted join carries the salt into the join key") {
    val p = plan("q_skew_join_salted")
    assert(p.contains("_salt"), "join should key on (key, salt)")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("word entropy is two aggregations, no window") {
    val p = plan("q_word_entropy")
    assert(!p.contains("Window"), "entropy must not sort per-doc windows")
    assert(!p.contains("CartesianProduct"))
  }

  test("full-outer reconciliation keeps both unmatched sides") {
    assert(plan("q_full_outer").contains("FullOuter"))
  }

  test("bloom-pruned join probes the fact side before its exchange") {
    val p = plan("q_bloom_pruned_join")
    assert(p.toLowerCase.contains("might_contain"),
      "fact scan should be probed against the dimension bloom")
    // the probe must sit BELOW the join's shuffle: in the plan tree the
    // first might_contain occurrence appears after (deeper than) the join
    val joinAt = p.indexOf("HashJoin")
    val probeAt = p.toLowerCase.indexOf("might_contain")
    assert(joinAt >= 0 && probeAt > joinAt,
      "bloom probe should be on the scan side under the join")
  }

  test("duplicate spans: hash-grouped first pass, gated survivor broadcast") {
    // the survivor broadcast is count-gated (a forced one OOMs on
    // heavily-duplicated corpora, an unhinted one shuffle-writes the gram
    // stream); under the cap the executed plan must carry the explicit
    // broadcast so the gram stream never stages for a shuffle
    val df = SparkEntry.queries("q_dup_spans")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"),
      "gated survivor set should broadcast back onto the gram stream")
  }

  test("cut-spans keeps strings out of the wide stages") {
    val df = SparkEntry.queries("q_cut_spans")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"),
      "gated verified-gram set should broadcast back onto the gram stream")
  }

  test("dedup-lines: owner via aggregation, no join against the line stream") {
    val p = plan("q_dedup_lines")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // exactly the designed wide stages: line-owner agg, per-doc regroup,
    // and the rebuilt-text join back onto the input — nothing joins the
    // exploded line stream itself, so no extra exchange may appear
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 4, s"dedupLines planned $exchanges hash exchanges:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "owner/count aggregates should have a map-side partial phase")
  }

  test("semantic dedup pairs only within cells — no unblocked product") {
    val df = SparkEntry.queries("q_dedup_semantic")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "within-cell pairing must join on center_id")
  }

  test("quantization is one narrow pass — no shuffle at all") {
    val p = plan("q_quantize_int8")
    assert(!p.contains("Exchange") || {
      // allow only the single-file-scan rebalance repartition
      "Exchange".r.findAllIn(p).size <= 1
    }, "quantization must not shuffle")
    assert(!p.contains("Join"))
  }

  test("scd2 and snapshot are one window pass per key") {
    for (q <- Seq("q_scd2", "q_snapshot_at")) {
      val p = plan(q)
      assert(p.contains("Window"), s"$q should plan a window")
      assert(!p.contains("Join"), s"$q must not self-join versions")
    }
  }

  test("weighted sample takes the WindowGroupLimit path per stratum") {
    // rank<=n after row_number must push a per-partition group limit, so a
    // corpus-sized stratum tops out at n rows per map task before the
    // shuffle — the property that makes the strata form 100 TB-safe
    val p = plan("q_weighted_sample")
    assert(p.contains("WindowGroupLimit"),
      "sample_rank<=n should push a group limit below the window")
  }

  test("profile is one Expand pass + one min/max fold — no per-column jobs") {
    val p = plan("q_profile")
    assert("Expand".r.findAllIn(p).size == 1,
      "multi-countDistinct should rewrite into one Expand")
    assert(!p.contains("Union"),
      "profiling must not union per-column subqueries")
    // r11 optimization shape: min/max (string buffers) run in a SEPARATE
    // global fold so the Expand chain can hash-aggregate — the two 1-row
    // results recombine with exactly one literal-style BNLJ, and the
    // expanded stream must never pay a SortAggregate's sorts again
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1,
      "expected exactly the 1-row stats recombination join")
    assert(!p.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the Expand distinct chain must hash-aggregate")
  }

  test("containment pairs join on the shingle key — no product") {
    val p = plan("q_ngram_containment")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("gopher repetition is one narrow kernel pass — no gram shuffle") {
    // document-local statistics must not shuffle by line/gram text: the
    // only allowed exchange is the input-balancing one, and no join exists
    val p = plan("q_gopher_repetition")
    assert(!p.contains("Join"), "per-doc stats must not join")
    assert("Exchange".r.findAllIn(p).size <= 1,
      "no aggregation shuffle keyed by gram text")
  }

  test("span decontamination probes a broadcast eval-gram set, no product") {
    val p = plan("q_cut_contaminated")
    assert(!p.contains("CartesianProduct"),
      "decontamination plans a cartesian product")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark-sized eval gram set should broadcast")
  }

  test("lm scoring joins the LM, never a product; filter ranks without a window") {
    val p = plan("q_lm_score")
    assert(!p.contains("CartesianProduct"),
      "lm scoring plans a cartesian product")
    assert(!p.contains("Window"), "lm scoring must not use a window")
    // the 1-row smoothing totals ride a broadcast nested loop — the only
    // acceptable non-equi join in the plan
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "dimension-sized LM should broadcast at test scale")
    val pc = plan("q_classify_linear")
    assert(!pc.contains("CartesianProduct") && !pc.contains("Window"),
      "classifier apply must stay an equi-join + aggregate dataflow")
    val pf = plan("q_lm_filter")
    assert(!pf.contains("CartesianProduct"),
      "lm filter plans a cartesian product")
    // the rank comes from sort + zipWithIndex, not percent_rank: no Window
    // node anywhere in the filter's plan
    assert(!pf.contains("Window"),
      "keepHeadByScore must rank via distributed sort, not a global window")
  }

  test("bigram lm scoring is equi-joins + aggregate — no window, no lag") {
    val p = plan("q_lm2_score")
    assert(!p.contains("CartesianProduct"),
      "bigram scoring plans a cartesian product")
    // adjacency is built inside the token array (transform + explode);
    // a lag/row_number formulation would plan a Window here
    assert(!p.contains("Window"), "bigram adjacency must not use a window")
    val p3 = plan("q_lm3_score")
    assert(!p3.contains("CartesianProduct") && !p3.contains("Window"),
      "trigram scoring is five dimension equi-joins + one aggregate")
  }

  test("kmv sample partial-aggregates before the group exchange") {
    val p = plan("q_kmv_sample")
    // TypedImperativeAggregate => ObjectHashAggregate with a partial mode
    // below the exchange: k-entry buffers shuffle, not the row stream
    assert(p.contains("ObjectHashAggregate"),
      "kmv_sample should plan as an object hash aggregate")
    assert(!p.contains("Window"),
      "the sampler exists to avoid the full window sort")
    val idx = p.indexOf("partial_kmv_sample")
    assert(idx >= 0, "map-side partial aggregation expected")
    assert(p.indexOf("Exchange") < idx || p.indexOf("Exchange", idx) >= 0,
      "partial agg should sit below an exchange")
  }

  test("boilerplate strip: unhinted anti-join, no product, no window") {
    val p = plan("q_boilerplate")
    assert(p.contains("LeftAnti"), "hot lines should cut via anti-join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"),
      "owner-free cut needs no window at all")
  }

  test("bpe trained encode stays one narrow pass after the scan") {
    // the merge table rides the closure: past the input exchange there is
    // no join/aggregation/window in the encode itself
    val p = plan("q_bpe_encode")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window") &&
      !p.contains("CartesianProduct"),
      "bpe encode must not join or sort — the model is closure state")
  }

  test("audio feature extraction is a single narrow mapPartitions pass") {
    val p = plan("q_audio_features")
    assert(!p.contains("Exchange") || p.contains("RoundRobin"),
      "audio decode must not shuffle beyond the initial rebalance")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("pq encode/probe: broadcast codebooks, no product, byte-only scan") {
    val pe = plan("q_pq_encode")
    assert(!pe.contains("CartesianProduct") && !pe.contains("Window"),
      "pq encode is a broadcast equi-join on sub + min_by aggregate")
    val pp = plan("q_pq_probe")
    // the per-query distance table rides a broadcast (crossJoin against
    // the m x ksub codebooks is BNLJ by construction — query-set-sized);
    // the corpus-side join is the (sub, code) broadcast hash equi-join
    assert(!pp.contains("CartesianProduct"),
      "pq probe must never plan an unblocked product")
    assert(pp.contains("BroadcastHashJoin"),
      "the code scan joins the broadcast distance table on (sub, code)")
  }

  test("dsir weights join a broadcast ratio table; sample avoids global sort") {
    val pw = plan("q_dsir_weights")
    assert(!pw.contains("CartesianProduct") && !pw.contains("Window"),
      "dsir scoring is one equi-join + per-doc aggregate")
    assert(pw.contains("BroadcastHashJoin"),
      "the <=4096-row log-ratio table should broadcast")
    val ps = plan("q_dsir_sample")
    assert(ps.contains("TakeOrderedAndProject"),
      "gumbel top-n must be per-partition heaps, not a global sort")
  }

  test("nb classify is joins + aggregates; score buckets rank without a window") {
    val pn = plan("q_nb_classify")
    assert(!pn.contains("CartesianProduct") && !pn.contains("Window"),
      "nb apply is a class fan-out + model equi-join + argmax aggregate")
    assert(pn.contains("BroadcastHashJoin") ||
      pn.contains("BroadcastNestedLoopJoin"),
      "the dimension-sized model tables should broadcast at test scale")
    val pb = plan("q_score_buckets")
    assert(!pb.contains("Window"),
      "bucket rank must come from sort + zipWithIndex, not a global window")
  }

  test("bench records a failing query as err, not as a fast time") {
    val broken = Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame](
      "q_ok" -> ((s, d) => s.range(5).toDF("n")),
      "q_broken" -> ((s, _) =>
        s.range(1).selectExpr("assert_true(id > 99, 'boom') AS x")))
    val (results, errors) = Bench.run(broken, spark, d, passes = 1)
    assert(results.map(_._1) == Seq("q_broken", "q_ok"))
    assert(errors.contains("q_broken") && errors("q_broken").nonEmpty)
    assert(!errors.contains("q_ok"))
  }
}
