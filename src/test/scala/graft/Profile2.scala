package graft

import org.apache.spark.sql.SparkSession

/** Repeat-timing harness: run selected queries 3x in one JVM to separate
  * real plan cost from JIT/GC/host noise.
  */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_dedup_clusters", "q_graph_components",
      "q_dedup_minhash_clusters", "q_ann_ivf_build")
    for (round <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"PROF r$round $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // stage-wise: q_dedup_clusters = shingle+pairs vs CC
    import org.apache.spark.sql.functions._
    for (round <- 1 to 3) {
      var t0 = System.nanoTime()
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val wv = split(col("text"), " ")
      val sh3 = array_distinct(
        when(size(wv) >= 3,
          transform(sequence(lit(0), size(wv) - 3), i =>
            concat_ws(" ", element_at(wv, i + 1), element_at(wv, i + 2),
              element_at(wv, i + 3))))
          .otherwise(array().cast("array<string>")))
      val sh0 = docs
        .select(col("doc_id"), explode(sh3).as("_s"))
        .select(col("doc_id"), xxhash64(col("_s")).as("sh"))
        .localCheckpoint(true)
      println(f"PROF r$round stage:shingle ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      val sizes = sh0.groupBy("doc_id").agg(count(lit(1)).as("setsize"))
      val rare = sh0.groupBy("sh").agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= 100).select("sh")
      val sh = sh0.join(rare, Seq("sh"))
      val pairs = sh.select(col("doc_id").as("id_a"), col("sh"))
        .join(sh.select(col("doc_id").as("id_b"), col("sh")), Seq("sh"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("id_a"), col("setsize").as("size_a")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("setsize").as("size_b")), Seq("id_b"))
        .filter(col("inter") / (col("size_a") + col("size_b") - col("inter")) >= 0.5)
        .select("id_a", "id_b").localCheckpoint(true)
      println(f"PROF r$round stage:pairs ${(System.nanoTime() - t0) / 1e9}%.2f s (${pairs.count()} pairs)")
      t0 = System.nanoTime()
      graft.ops.Dedup.clustersFromPairs(docs, pairs)
        .write.format("noop").mode("overwrite").save()
      println(f"PROF r$round stage:cc ${(System.nanoTime() - t0) / 1e9}%.2f s")
      sh0.unpersist()
    }
    spark.stop()
  }
}
