package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch 2: the NSW graph-ANN tier (single-layer HNSW-lite) —
  * staged-form identity vs brute force, deployment-parameter recall
  * floor on clustered data, a planted graph where the answer is only
  * reachable by hopping, and the graph-shape invariants.
  */
class Round8bOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round8b-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Deterministic clustered vectors: 8 ORTHOGONAL clusters x 25 members
    * in 16 dims (cluster c peaks dimension 2c) + a small deterministic
    * wobble — genuinely separated basins, the regime graph-ANN routing
    * is built for (a near-uniform shell has no structure to navigate).
    */
  private lazy val clustered: DataFrame = {
    import spark.implicits._
    (0L until 200L).map { i =>
      val cl = (i % 8).toInt
      (i, Array.tabulate(16) { j =>
        ((if (j == 2 * cl) 1.0 else 0.0) +
          0.05 * math.sin(i * 3.3 + j * 1.9)).toFloat
      })
    }.toDF("vec_id", "embedding")
  }

  test("nswSearch staged form (entries = corpus, ef >= n) equals " +
      "bruteForceTopK through the full hop machinery") {
    val q = clustered.filter(col("vec_id") < 6)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val idx = graft.ops.Similarity.buildNswGraph(clustered, m = 4,
      nCenters = 8)
    val staged = graft.ops.Similarity.nswSearch(q, idx, clustered, k = 5,
        ef = 1 << 18, hops = 1,
        entries = Some(clustered.select("vec_id")))
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val brute = graft.ops.Similarity.bruteForceTopK(q, clustered, k = 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(staged === brute)
    idx.release()
  }

  test("nswSearch recall floor at deployment parameters on clustered data") {
    val q = clustered.filter(col("vec_id") % 40 === 1)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val idx = graft.ops.Similarity.buildNswGraph(clustered, m = 6,
      nCenters = 8)
    val got = graft.ops.Similarity.nswSearch(q, idx, clustered, k = 5,
        ef = 16, hops = 3)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = graft.ops.Similarity.bruteForceTopK(q, clustered, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.9,
      s"graph beam search must recall >= 0.9 on clustered data, got $recall")
    idx.release()
  }

  test("beam search HOPS: a neighbor reachable only through the graph " +
      "is found at hops >= 2 and missed at hops = 0 (planted chain)") {
    import spark.implicits._
    // a chain with MONOTONE-improving similarity toward the query (a
    // flat tie would strand an ef=1 beam on the smaller id): entry 0 ->
    // 1 -> 2 -> 3, the query equals node 3's vector, so each hop
    // advances one link
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.0f, 0.0f, 0.1f)),
      (2L, Array(0.5f, 0.0f, 0.0f, 0.5f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 3L),
      (3L, 2L)).toDF("src", "dst")
    val entries = Seq(Tuple1(0L)).toDF("vec_id")
    val idx = graft.ops.Similarity.NswIndex(edges, entries)
    val q = Seq((100L, Array(0.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("query_id", "embedding")
    def top1(hops: Int): Long =
      graft.ops.Similarity.nswSearch(q, idx, vecs, k = 1, ef = 1,
        hops = hops).head().getAs[Long]("vec_id")
    assert(top1(0) === 0L, "no hops: only the entry is scored")
    // ef = 1 keeps only the best node per round; the beam walks the chain
    assert(top1(3) === 3L, "three hops reach the planted neighbor")
  }

  test("buildNswGraph shape: out-degree <= m + fingers (+ mesh for " +
      "gateways); gatewaysPerCell spread per cell; complete gateway mesh") {
    val idx = graft.ops.Similarity.buildNswGraph(clustered, m = 4,
      nCenters = 8, gatewaysPerCell = 2, fingers = 2)
    val entries = idx.entries.collect().map(_.getLong(0)).toSet
    assert(entries.size === 16, "gatewaysPerCell per (non-tiny) cell")
    val deg = idx.edges.groupBy("src").agg(count(lit(1)).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    deg.foreach { case (src, d) =>
      val cap = 4L + 2L + (if (entries(src)) entries.size - 1L else 0L)
      assert(d <= cap, s"node $src degree $d exceeds m+fingers(+mesh) $cap")
    }
    val gwEdges = idx.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (s, t) => entries(s) && entries(t) }.toSet
    assert(gwEdges.size === 16 * 15, "gateways form a complete directed mesh")
    idx.release()
  }
}
