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
    val names = Seq("q_json_funcs", "q_graph_components", "q_dedup_clusters",
      "q_equi_join_agg")
    for (round <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"PROF r$round $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
