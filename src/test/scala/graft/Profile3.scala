package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style timing harness for the token-tier operators (run by
  * hand: sbt "Test/runMain graft.Profile3 [threads] [mult]"). Three rounds
  * each — this VM's timings are noisy, compare the MIN per operator.
  */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("8")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false")
      .appName("profile3").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val docs = (0 until mult)
      .map(i => base.withColumn("doc_id",
        col("doc_id") + lit(i.toLong * 10_000_000L)))
      .reduce(_ union _)
      .repartition(threads.toInt).localCheckpoint(true)
    println(s"docs=${docs.count()} mult=$mult threads=$threads")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (round <- 1 to 3) {
      time(s"dsir_full r$round") {
        noop(graft.ops.TextAnalysis.dsirLogRatio(docs,
          docs.filter(col("doc_id") % 10 === 0)))
      }
      time(s"nb_full r$round") {
        val labeled = docs.withColumn("label",
          (col("doc_id") % 5).cast("string"))
        val m = graft.ops.TextAnalysis.trainNaiveBayes(labeled, "label",
          minCount = 2L)
        noop(graft.ops.TextAnalysis.classifyNaiveBayes(labeled, m))
      }
    }
    spark.stop()
  }
}
