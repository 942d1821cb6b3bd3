package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.TextFunctions._

/** Dev smoke driver: exercises the custom expressions through a real
  * SparkSession over real testdata (not a unit test — a runnable surface).
  * Run: sbt "Test/runMain graft.DriveMain"
  */
object DriveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dirty = docs.select($"doc_id",
      concat(lit("<jats:p>"), col("text"), lit("</jats:p>\n&amp;amp; renewa­ble")).as("raw"))
    println("== clean_html over parquet-backed text ==")
    dirty.select($"doc_id", clean_html($"raw").as("clean")).show(3, 80)

    println("== SQL-registered functions ==")
    TextFunctions.registerAll(spark)
    dirty.createOrReplaceTempView("dirty")
    spark.sql(
      """SELECT doc_id, clean_html(raw) AS c,
        |       normalize_doi('  https://doi.org/10.1/x.1.. ') AS d,
        |       python_title('plazas-nino') AS t,
        |       name_similarity('James Sridharan','Vignesh Sridharan') AS sim
        |FROM dirty LIMIT 3""".stripMargin).show(3, 60)

    // compact plan strings mark whole-stage-codegen subtrees with "*(n)"
    val plan = dirty.select(clean_html($"raw")).queryExecution.executedPlan.toString
    println("HAS_WSCG=" + plan.contains("*("))

    println("== corpus ops over real testdata ==")
    import graft.functions.CorpusFunctions._
    import graft.ops.{Dedup, Similarity, TextAnalysis}
    val realDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dups = Dedup.minhashLsh(realDocs, threshold = 0.5)
    println("minhash near-dup pairs at sf0.001: " + dups.count())
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val topk = Similarity.bruteForceTopK(
      emb.limit(3).select($"vec_id".as("query_id"), $"embedding"), emb, k = 3)
    topk.show(9, false)
    TextAnalysis.annotate(realDocs)
      .select($"doc_id", $"lang_pred", $"n_tokens_ws", $"quality", $"fingerprint")
      .show(3, false)
    val simPlan = realDocs.select(simhash64($"text")).queryExecution
      .executedPlan.toString
    println("CORPUS_WSCG=" + simPlan.contains("*("))

    println("== probes: null / empty ==")
    Seq(Option.empty[String], Some(""), Some("ok<b>x</b>")).toDF("s")
      .select(clean_html($"s").as("c"), normalize_doi($"s").as("d")).show()
    spark.sql("SELECT name_similarity(NULL, 'x') AS n").show()
    println("DRIVE_OK")
    spark.stop()
  }
}
