package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 hardening: the fixed-point rank guard targets the actual
  * division hazard (all-zero out-degree sources, not any zero weight),
  * and the KMV estimate regimes at the NDV == k boundary match the
  * documented contract (exact strictly below k; estimator at and above,
  * kth == 0 guarded like the streaming twin).
  */
class Round10OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round10-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("fixed-point rank: a zero weight alongside positive siblings is " +
      "valid; an all-zero out-degree source fails loudly") {
    import spark.implicits._
    // source a carries a harmless zero edge next to a positive one —
    // its weighted out-degree stays positive, so fixed mode must run
    val mixed = Seq(("a", "b", 1.0), ("a", "c", 0.0), ("b", "c", 2.0))
      .toDF("src", "dst", "w")
    assert(graft.graph.GraphOps.pageRank(mixed, weightCol = Some("w"),
      maxIter = 2, scale = Some(1000000L)).count() > 0)
    // an isolated all-zero edge zeroes BOTH endpoints' out-degrees
    // (edges symmetrize) — the divide-by-zero hazard, guarded loudly
    val allZero = Seq(("a", "b", 0.0)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      graft.graph.GraphOps.pageRank(allZero, weightCol = Some("w"),
        maxIter = 2, scale = Some(1000000L)).collect()
    }
    assert(e.getMessage.contains("out-degree"))
  }

  test("kmvDistinct regimes at the k boundary: exact strictly below k, " +
      "Beyer estimator at NDV == k") {
    import spark.implicits._
    val k = 8
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      BigInt(d.digest(s.getBytes("UTF-8")).take(8)).toLong >>> 4
    }
    def run(ndv: Int): (Int, Long, Long) = {
      val df = (0 until ndv).flatMap(i => Seq(("g", s"v$i"), ("g", s"v$i")))
        .toDF("g", "v")
      val r = graft.ops.Sketches.kmvDistinct(df, Seq("g"), "v", k = k)
        .select("k_eff", "kth_hash60", "approx_distinct").head()
      (r.getInt(0), r.getLong(1), r.getLong(2))
    }
    // NDV = k - 1: sketch not full, every field exact
    val (e1, _, a1) = run(k - 1)
    assert(e1 === k - 1 && a1 === (k - 1).toLong)
    // NDV = k: sketch full — indistinguishable from NDV > k, so the
    // ESTIMATOR answers (the documented exact regime is NDV < k)
    val hashes = (0 until k).map(i => hash60(s"v$i")).sorted
    val kth = hashes.last
    val expected =
      (BigInt(k - 1) * BigInt(1152921504606846976L) / BigInt(kth)).toLong
    val (e2, kth2, a2) = run(k)
    assert(e2 === k && kth2 === kth && a2 === expected)
  }
}
