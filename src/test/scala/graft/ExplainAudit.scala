package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("q_scan_filter_project", "q_equi_join_agg",
        "q_contains_theta_join", "q_semi_join", "q_window_top1",
        "q_dedup_minhash", "q_sim_topk", "q_bloom_pruned_join",
        "q_dup_spans", "q_quantize_int8", "q_approx_topk",
        "q_ann_ivf_quant", "q_scd2", "q_hamming_pairs", "q_bm25_topk",
        "q_interval_overlap", "q_knn_classify", "q_centroid_classify",
        "q_dedup_url", "q_filter_paragraphs", "q_rrf_fuse",
        "q_sample_negatives", "q_epoch_shuffle", "q_asof_tolerance",
        "q_split_leakage", "q_bm25_probe_persisted")) {
      val plan = SparkEntry.queries(name)(spark, d)
        .queryExecution.executedPlan.toString
      println(s"===== $name =====")
      println(plan.linesIterator.filter(l =>
        l.contains("FileScan") || l.contains("PushedFilters") ||
        l.contains("Join") || l.contains("Exchange") || l.contains("Window") ||
        l.contains("WindowGroupLimit") || l.contains("ReadSchema"))
        .map(_.take(220)).mkString("\n"))
      val scans = plan.linesIterator.count(_.contains("FileScan"))
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      println(s"-- scans=$scans exchanges=$exchanges wscg=${plan.contains("*(")}")
    }
    spark.stop()
  }
}
