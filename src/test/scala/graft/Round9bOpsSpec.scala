package graft

import graft.ops.{Sketches, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 batch 2: the KMV distinct sketch (exact-below-k contract,
  * estimator regime, lossless merge) and incremental index maintenance
  * (ivfAppend / ivfQAppend / ivfPqAppend) at both staged and deployment
  * parameters.
  */
class Round9bOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round9b-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val d = "/root/testdata/sf0.001"

  /** The same 60-bit md5-lattice hash the op uses, computed in-JVM. */
  private def hash60(v: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  // --- KMV distinct --------------------------------------------------------

  test("kmvDistinct exact-below-k regime: approx_distinct equals " +
      "count(distinct) and kth_hash60 equals the max lattice hash") {
    import spark.implicits._
    val df = (0 until 300).map(i => (s"g${i % 3}", (i % 70).toLong))
      .toDF("g", "v")
    val got = Sketches.kmvDistinct(df, Seq("g"), "v", k = 128)
      .select("g", "k_eff", "kth_hash60", "approx_distinct")
      .as[(String, Int, Long, Long)].collect()
      .map { case (g, a, b, c) => g -> ((a, b, c)) }.toMap
    val expKth = (0 until 70).map(i => hash60(i.toString)).max
    (0 until 3).foreach { g =>
      assert(got(s"g$g") === ((70, expKth, 70L)))
    }
  }

  test("kmvDistinct estimator regime (k < NDV): fields match the BigInt " +
      "reference over the same hashes") {
    import spark.implicits._
    val k = 32
    val n = 500
    val df = (0 until n).map(i => ("g", i.toLong)).toDF("g", "v")
    val got = Sketches.kmvDistinct(df, Seq("g"), "v", k = k)
      .select("k_eff", "kth_hash60", "approx_distinct")
      .as[(Int, Long, Long)].head()
    val hashes = (0 until n).map(i => hash60(i.toString)).sorted.take(k)
    val kth = hashes.last
    val est = (BigInt(k - 1) * BigInt(1152921504606846976L) / kth).toLong
    assert(got === ((k, kth, est)))
    // sanity: the estimator lands in the right ballpark for real use
    assert(math.abs(est - n) < n, s"estimate $est wildly off $n")
  }

  test("kmvMerge of per-slice partials is lossless: identical fields to " +
      "the one-shot sketch, in BOTH regimes") {
    import spark.implicits._
    val df = (0 until 400)
      .map(i => (s"g${i % 2}", s"s${i % 5}", (i % 90).toLong))
      .toDF("g", "slice", "v")
    Seq(16, 512).foreach { k => // estimator regime and exact regime
      val merged = Sketches.kmvMerge(
        Sketches.kmvPartials(df, Seq("g"), "slice", "v", k = k),
        Seq("g"), k = k)
        .select("g", "k_eff", "kth_hash60", "approx_distinct")
        .as[(String, Int, Long, Long)].collect().toSet
      val oneShot = Sketches.kmvDistinct(df, Seq("g"), "v", k = k)
        .select("g", "k_eff", "kth_hash60", "approx_distinct")
        .as[(String, Int, Long, Long)].collect().toSet
      assert(merged === oneShot, s"k=$k")
    }
  }

  // --- incremental index maintenance --------------------------------------

  private lazy val emb: DataFrame =
    spark.read.parquet(s"$d/embeddings.parquet")

  private def probeRows(df: DataFrame): Set[(Long, Long, Int)] = {
    import df.sparkSession.implicits._
    df.select("query_id", "vec_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
  }

  test("ivfAppend of an EMPTY batch probes bit-equal to the original") {
    val base = Similarity.buildIvfIndex(emb, nCenters = 8)
    val appended = Similarity.ivfAppend(base, emb.limit(0))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val a = probeRows(Similarity.ivfProbe(q, base, k = 5, nProbe = 3))
    val b = probeRows(Similarity.ivfProbe(q, appended, k = 5, nProbe = 3))
    assert(a === b)
    appended.cells.unpersist(); base.release()
  }

  test("ivfAppend at DEPLOYMENT parameters: an appended exact duplicate " +
      "is found at rank 1 (same cell as its twin by construction)") {
    val base = Similarity.buildIvfIndex(emb, nCenters = 8)
    // plant duplicates of vectors 0..4 under new ids
    val dups = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val appended = Similarity.ivfAppend(base, dups)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top1 = probeRows(
      Similarity.ivfProbe(q, appended, k = 1, nProbe = 1))
    (0L until 5L).foreach { i =>
      assert(top1.contains((i, i + 1000000L, 1)),
        s"duplicate of $i not at rank 1: $top1")
    }
    appended.cells.unpersist(); base.release()
  }

  test("ivfQAppend re-encodes exactly like the build (unchanged vectors " +
      "reproduce their cell AND codes) and finds appended duplicates") {
    import spark.implicits._
    val base = Similarity.buildIvfIndex(emb, nCenters = 8)
    val qidx = Similarity.quantizeIndex(base)
    val dups = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val appended = Similarity.ivfQAppend(qidx, dups)
    val orig = appended.cells.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("center_id"), col("codes"),
        col("q_min"), col("q_scale"))
      .as[(Long, Long, Seq[Int], Double, Double)].collect()
      .map(r => r.copy(_1 = r._1 + 1000000L)).toSet
    val added = appended.cells.filter(col("vec_id") >= 1000000L)
      .select(col("vec_id"), col("center_id"), col("codes"),
        col("q_min"), col("q_scale"))
      .as[(Long, Long, Seq[Int], Double, Double)].collect().toSet
    assert(added === orig)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top = probeRows(
      Similarity.ivfProbeQuantized(q, appended, k = 2, nProbe = 1))
    (0L until 5L).foreach { i =>
      assert(top.exists(r => r._1 == i && r._2 == i + 1000000L),
        s"quantized duplicate of $i missing: $top")
    }
    appended.cells.unpersist(); qidx.cells.unpersist(); base.release()
  }

  test("ivfPqAppend: staged probe after append equals bruteForceTopK " +
      "over the union, and empty append is probe-identical") {
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 === 1)
    val base = Similarity.buildIvfPqIndex(even, nCenters = 4, m = 16,
      ksub = 16)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val empty = Similarity.ivfPqAppend(base, odd.limit(0))
    assert(probeRows(Similarity.ivfPqProbe(q, empty, even, k = 3,
        nProbe = 2, overfetch = 3)) ===
      probeRows(Similarity.ivfPqProbe(q, base, even, k = 3,
        nProbe = 2, overfetch = 3)))
    empty.cells.unpersist()
    val appended = Similarity.ivfPqAppend(base, odd)
    val staged = probeRows(Similarity.ivfPqProbe(q, appended, emb, k = 3,
      nProbe = 4, overfetch = 1 << 18))
    val exact = probeRows(
      Similarity.bruteForceTopK(q, emb, k = 3)
        .select("query_id", "vec_id", "rank"))
    assert(staged === exact)
    appended.cells.unpersist(); base.release()
  }
}
