package graft

import java.nio.file.Files

import graft.graph.GraphStore
import graft.ingest.EntityResolution
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape assertions: the store's physical layout and the
  * size-adaptive join strategy in entity resolution.
  */
class StoreScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("store-scale-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("store works against a file: URI warehouse (Hadoop FS API)") {
    import spark.implicits._
    val wh = "file:" + Files.createTempDirectory("wh-uri").toString
    val store = new GraphStore(spark, wh)
    store.upsertNodes("countries",
      Seq(("LBR", "Liberia")).toDF("id", "name"), key = "id")
    assert(store.nodeTable("countries").count() == 1)
    store.truncate()
    assert(store.nodeTable("countries").count() == 0)
  }

  test("outputs table is physically partitioned by result_type") {
    import spark.implicits._
    val whDir = Files.createTempDirectory("wh-part")
    val store = new GraphStore(spark, whDir.toString)
    store.upsertNodes("outputs", Seq(
      ("u1", "10.1/a", "publication"),
      ("u2", "10.1/b", "dataset")).toDF("uuid", "doi", "result_type"),
      key = "doi")
    val dirs = new java.io.File(s"$whDir/nodes/outputs").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("result_type=publication", "result_type=dataset"))
    // partition pruning: a result_type filter scans one directory
    val pruned = store.nodeTable("outputs")
      .filter(col("result_type") === "dataset")
    assert(pruned.count() == 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
    // merge-on-key rewrite keeps the partitioned layout
    store.mergeNodes("outputs", Seq(("u2", "10.1/b", "dataset", "W9"))
      .toDF("uuid", "doi", "result_type", "openalex"), key = "doi")
    assert(store.nodeTable("outputs").count() == 2)
    assert(store.nodeTable("outputs")
      .filter(col("doi") === "10.1/b").head().getAs[String]("openalex") == "W9")
    val dirs2 = new java.io.File(s"$whDir/nodes/outputs").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs2 == Set("result_type=publication", "result_type=dataset"))
  }

  test("author resolution broadcasts small dims but is not forced") {
    import spark.implicits._
    val mentions = (1 to 50).map(i =>
      ("10.1/x", s"out-$i", s"F$i", s"L$i", null.asInstanceOf[String], 1, i.toLong))
      .toDF("doi", "output_uuid", "first_name", "last_name", "orcid", "rank",
        "mention_order")
    // small FILE-BACKED authors table (size stats available -> broadcast)
    val authDir = Files.createTempDirectory("auth").toString
    (1 to 10).map(i => (s"u$i", s"F$i", s"L$i", s"https://orcid.org/$i"))
      .toDF("uuid", "first_name", "last_name", "orcid")
      .write.mode("overwrite").parquet(authDir)
    val authors = spark.read.parquet(authDir)
    val plan = EntityResolution.resolveAuthors(mentions, authors)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "small file-backed dim should broadcast")
    // and no *forced* broadcast hint survives in the logical plan: the
    // decision came from size stats, so a stats-free large table would
    // fall back to a shuffled join
    val logical = EntityResolution.resolveAuthors(mentions, authors)
      .queryExecution.logical.toString
    assert(!logical.contains("UnresolvedHint") && !logical.contains("hint"),
      "no forced broadcast hint expected in resolveAuthors")
  }
}
