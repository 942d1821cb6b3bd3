package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Full-contract plan sweep: EVERY SparkEntry query is planned and
  * asserted free of CartesianProduct, and free of
  * BroadcastNestedLoopJoin except where a documented allowlist entry
  * justifies the broadcast-BNLJ (1-row stats tables riding `crossJoin`,
  * dimension-sized model/centroid tables, theta-join predicates that
  * cannot equi-key). Insurance against a future query quietly planning a
  * product — the per-operator PlanShapeSpec asserts the positive shapes;
  * this asserts the global negative.
  */
class ContractPlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("cpa-wh").toString)
    .config("spark.ui.enabled", "false")
    .appName("contract-plan-audit").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Queries allowed to plan a BROADCAST nested-loop join, with the
    * justification. Every entry is a broadcast of a bounded-size side:
    * either a 1-row aggregate (corpus stats / bounds) or a
    * dimension-sized model table — never corpus-vs-corpus.
    */
  val bnljAllowed: Map[String, String] = Map(
    "q_contains_theta_join" -> "CONTAINS theta-join: docs x dimension-sized country list (no equi key exists); broadcast BNLJ is the intended plan",
    "q_theta_top1_per_key"  -> "same CONTAINS theta-join feeding the WindowGroupLimit top-1",
    "q_blocklist_phrases"   -> "phrase blocklist containment: docs x broadcast phrase list (theta predicate)",
    "q_sim_topk"            -> "brute-force cosine baseline: query set (10 rows) broadcast against corpus",
    "q_knn_classify"        -> "exact kNN: bounded query set broadcast against corpus scan",
    "q_knn_classify_ann"    -> "IVF-backed kNN: query set x broadcast centroid table for cell ranking",
    "q_ann_ivf"             -> "IVF probe: query set x broadcast centroid table (nCenters rows)",
    "q_ann_ivf_split"       -> "split probe: the same broadcast centroid ranking on each side (base + delta)",
    "q_ann_ivf_compact"     -> "compacted-generation probe: the same broadcast centroid ranking (nCenters rows)",
    "q_ann_ivfq_split"      -> "quantized split probe: the same broadcast centroid ranking on each side",
    "q_ivfpq_compact"       -> "compacted IVF-PQ probe: broadcast centroid + m*ksub codebook tables (staged exhaustive)",
    "q_bm25_compact"        -> "same 1-row stats table through the COMPACTED postings generation",
    "q_ann_ivf_quant"       -> "quantized IVF probe: same broadcast centroid ranking",
    "q_ivf_assign"          -> "cell assignment: corpus x broadcast centroid table",
    "q_centroid_classify"   -> "Rocchio: queries x broadcast per-label centroid table (label-count rows)",
    "q_emb_near_pairs"      -> "exact near-pair oracle baseline: deliberately the brute-force sibling of the LSH query (which is product-free)",
    "q_pq_probe"            -> "ADC probe: queries x broadcast codebook distance tables (m x ksub rows)",
    "q_pq_probe_rerank"     -> "ADC probe + broadcast candidate rerank against the float corpus",
    "q_bm25_topk"           -> "1-row corpus stats (n, avgdl) crossJoin onto scored candidates",
    "q_bm25_probe"          -> "same 1-row stats table through the session postings index",
    "q_bm25_probe_persisted" -> "same 1-row stats table through the RELOADED postings index",
    "q_tfidf"               -> "1-row doc-count table crossJoin for idf",
    "q_chi2_terms"          -> "1-row class-total table crossJoin into the per-term chi2 expression",
    "q_nb_classify"         -> "docs x broadcast class-prior table (label-count rows)",
    "q_lm_score"            -> "1-row vocab/total-count table crossJoin for smoothing denominators",
    "q_lm2_score"           -> "same 1-row LM stats broadcast (bigram backoff)",
    "q_lm3_score"           -> "same 1-row LM stats broadcast (trigram backoff)",
    "q_lm_filter"           -> "1-row total-count table (_n) crossJoin for the keep-fraction cutoff",
    "q_score_buckets"       -> "same 1-row _n table for bucket boundaries",
    "q_mix_temperature"     -> "per-source weight table (source-count rows) broadcast onto the corpus",
    "q_ks_drift"            -> "1-row bounds table and 1-row (n_a, n_b) totals crossJoin",
    "q_curate_batch"        -> "1-row totals inside the packing stage, as q_curate_pipeline",
    "q_rrf_fuse"            -> "hybrid retrieval legs: bm25's 1-row stats crossJoin + the dense leg's broadcast 3-row query set",
    "q_sample_negatives"    -> "negative sampling: queries x broadcast bottom-poolSize (64-row) candidate pool",
    "q_mmr_rerank"          -> "candidate generation: corpus x broadcast 3-row query set (brute-force top-20 feed)",
    "q_curate_pipeline"     -> "1-row totals inside the packing stage",
    "q_t_closeness"         -> "1-row corpus-total table crossJoin into the TVD fraction",
    "q_pmi_collocations"    -> "1-row total-bigram-count table crossJoin into the PMI expression",
    "q_retrieval_metrics"   -> "bm25's 1-row stats crossJoin inside the ranked-run leg being evaluated",
    "q_cohen_kappa"         -> "two 1-row aggregate tables (totals x chance-agreement numerator) crossJoin",
    "q_expectations"        -> "refers_to check: 1-row total-count table crossJoin onto the 1-row violation count",
    "q_tfidf_cosine_pairs"  -> "1-row doc-count table crossJoin for idf, as q_tfidf",
    "q_fleiss_kappa"        -> "two 1-row aggregate tables (item totals x label-marginal squares) crossJoin",
    "q_hard_negatives"      -> "hard-negative mining: bounded labeled query set (10 rows) broadcast against corpus scan",
    "q_hard_negatives_from" -> "same bounded query set broadcast in the exhaustive brute-force candidate leg of the staged-form certification",
    "q_unimax"              -> "waterfilling over the source dimension: 1-row source-count and 1-row threshold tables crossJoin",
    "q_unimax_apply"        -> "embeds the q_unimax allocation subplan (same 1-row crossJoins); the apply side is a broadcast dimension join",
    "q_mad_outliers"        -> "two 1-row exact-percentile stats tables (median, MAD) crossJoin",
    "q_quantile_bins"       -> "1-row quantile-cut-array table crossJoin",
    "q_rag_retrieve"        -> "bm25's 1-row corpus stats crossJoin inside the chunk-scoring leg",
    "q_modularity_score"    -> "1-row edge-count table (m) crossJoin onto the 1-row parts aggregate for the folded integer fraction",
    "q_ivfpq_topk"          -> "IVF-PQ probe: query set x broadcast centroid table + x broadcast m*ksub codebook table (staged-form exhaustive certification)",
    "q_ivfpq_probe"         -> "same broadcast centroid/codebook tables at deployment parameters",
    "q_normalize_scores"    -> "two 1-row stats tables (zscore sums, minmax bounds) crossJoin",
    "q_normalize_robust"    -> "1-row exact-percentile stats table (med, q1, q3) crossJoin",
    "q_winsorize"           -> "1-row quantile-cut table crossJoin",
    "q_rfm"                 -> "1-row reference-date table + three 1-row quantile-cut tables crossJoin",
    "q_profile"             -> "two 1-row aggregate results (count/distinct pass x min/max pass) crossJoin into the per-column report",
    "q_ivf_drift"           -> "cell routing's broadcast centroid table + 1-row totals and 1-row tv_u6 tables crossJoin onto the centroid-sized histogram",
    "q_bm25_drift"          -> "four 1-row aggregate tables (index stats x batch stats x batch-term mass x OOV mass) crossJoin")

  test("no contract query plans a CartesianProduct; BNLJ only where allowlisted") {
    val d = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ListBuffer[String]()
    // bench-only production twins ride the same sweep: they are part of
    // the benched surface, and a product plan there is a real perf bug
    // even without an oracle
    val all = SparkEntry.queries ++ SparkEntry.benchOnly
    all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, d).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name))
        offenders += s"$name: unapproved BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty,
      s"product plans outside the allowlist:\n${offenders.mkString("\n")}")
    // the allowlist itself stays honest: no stale entries for queries
    // that no longer exist
    val stale = bnljAllowed.keySet -- all.keySet
    assert(stale.isEmpty, s"allowlist entries for unknown queries: $stale")
  }
}
