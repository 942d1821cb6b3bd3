package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 batch 2: the combined IVF-PQ retrieval tier — staged-form
  * equality with brute force (exhaustive parameters) and the
  * deployment-parameter recall floor.
  */
class Round7bOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round7b-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.ops.Similarity

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select("vec_id", "embedding")
    .localCheckpoint(true)

  private lazy val queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding"))

  private lazy val index =
    Similarity.buildIvfPqIndex(emb, nCenters = 8, m = 16, ksub = 16)

  test("ivfPqProbe exhaustive (nProbe = nCenters, overfetch >= corpus) " +
      "== bruteForceTopK exactly, through the full combined code path") {
    val got = Similarity.ivfPqProbe(queries, index, emb, k = 5,
        nProbe = 8, overfetch = 1 << 18)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("ivfPqProbe at deployment parameters (nProbe 4/8, overfetch 3): " +
      "recall@5 floor vs brute force") {
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfPqProbe(queries, index, emb, k = 5,
        nProbe = 4, overfetch = 3)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every query must return a full k, and cells+ADC+rerank together
    // should recover a reasonable share of the exact set (the two
    // pruning levers compose; the floor is deliberately conservative)
    assert(approx.groupBy(_._1).forall(_._2.size == 5))
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5 = $recall")
  }

  test("cells carry bytes only: no float embedding column survives into " +
      "the probe-path cell table") {
    assert(!index.cells.columns.contains("_cv") &&
      !index.cells.columns.contains("embedding"))
    assert(index.cells.columns.toSet ==
      Set("vec_id", "center_id", "codes", "recon_norm"))
  }
}
