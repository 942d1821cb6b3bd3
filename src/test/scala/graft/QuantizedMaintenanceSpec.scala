package graft

import java.nio.file.Files

import graft.ops.{IndexStore, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance parity for the byte-code tiers: the int8 and PQ cell
  * families stream through the same delta-tree lifecycle as the float
  * tier — ingest lands code rows + drift audits, the WithDelta readers
  * union live partitions, the SCHEMA-GENERIC compactIvfDeltas folds
  * them crash-safely, and the split probe keeps the bucketed base's
  * plan while merging per-side top-k exactly.
  */
class QuantizedMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("qmaint-wh").toString)
    .config("spark.ui.enabled", "false")
    .appName("quantized-maintenance-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  lazy val vecs: DataFrame = {
    import spark.implicits._
    (0 until 160).map { i =>
      val v = Array.tabulate(16)(d =>
        (math.sin(i * 0.37 + d) + (if (d == i % 4) 2.0 else 0.0)).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val even = vecs.filter(col("vec_id") % 2 === 0)
  private lazy val odd = vecs.filter(col("vec_id") % 2 === 1)
  private lazy val q = vecs.filter(col("vec_id") % 40 === 0)
    .select(col("vec_id").as("query_id"), col("embedding"))

  test("ivfQAppendIngest: streamed code deltas probe bit-equal to the " +
      "batch append operator; the generic compaction folds them with " +
      "the delta tree still on disk; prune changes nothing") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("qing-ck").toString
    val delta = Files.createTempDirectory("qing-delta").toString + "/d"
    val audit = Files.createTempDirectory("qing-audit").toString
    val ivf = Similarity.buildIvfIndex(even, nCenters = 4, iters = 2)
    val base = Similarity.quantizeIndex(ivf)
    IndexStore.writeIvfIndexQ(base, "qm_ivfq", buckets = 4)
    // reader tolerates the not-yet-existing delta tree
    assert(IndexStore.readIvfIndexQWithDelta(spark, "qm_ivfq", delta)
      .cells.count() === even.count())
    val oddRows = odd.as[(Long, Seq[Float])].collect()
    val (b1, b2) = oddRows.splitAt(oddRows.length / 2)
    val mem = MemoryStream[(Long, Seq[Float])]
    def run() = graft.streaming.Streams.ivfQAppendIngest(
      mem.toDF().toDF("vec_id", "embedding"), "qm_ivfq", delta, audit,
      ckpt).awaitTermination()
    mem.addData(b1.toSeq: _*); run()
    mem.addData(b2.toSeq: _*); run()
    // expected: the BATCH operator over the same rows
    val appended = Similarity.ivfQAppend(base,
      odd.withColumnRenamed("vec_id", "vec_id"))
    val exp = rowsOf(Similarity.ivfProbeQuantized(q, appended, k = 5,
      nProbe = 4).select("query_id", "vec_id", "rank"))
    val merged = IndexStore.readIvfIndexQWithDelta(spark, "qm_ivfq", delta)
    assert(merged.cells.count() === vecs.count())
    assert(rowsOf(Similarity.ivfProbeQuantized(q, merged, k = 5,
      nProbe = 4).select("query_id", "vec_id", "rank")) === exp)
    // split probe: per-side top-k merge row-equal to the unioned probe
    val deltaCells = spark.read.parquet(delta)
      .select("vec_id", "center_id", "codes", "q_min", "q_scale")
    assert(rowsOf(Similarity.ivfProbeQuantizedSplit(q,
        IndexStore.readIvfIndexQ(spark, "qm_ivfq"), deltaCells, k = 5,
        nProbe = 4).select("query_id", "vec_id", "rank")) === exp)
    // drift audit: one report per batch, one row per centroid
    val auditDf = spark.read.parquet(audit)
    assert(auditDf.select("batch_id").distinct().count() === 2)
    assert(auditDf.count() === 8)
    // the SAME generic compaction folds code cells; the leftover delta
    // tree is skipped (crash window), then pruned
    assert(IndexStore.compactIvfDeltas(spark, "qm_ivfq", delta,
      buckets = 4) === 1L)
    val compacted = IndexStore.readIvfIndexQWithDelta(spark, "qm_ivfq",
      delta)
    assert(compacted.cells.count() === vecs.count())
    assert(rowsOf(Similarity.ivfProbeQuantized(q, compacted, k = 5,
      nProbe = 4).select("query_id", "vec_id", "rank")) === exp)
    assert(IndexStore.pruneFoldedDeltas(spark, "qm_ivfq", delta) === 2)
    assert(rowsOf(Similarity.ivfProbeQuantized(q,
      IndexStore.readIvfIndexQWithDelta(spark, "qm_ivfq", delta), k = 5,
      nProbe = 4).select("query_id", "vec_id", "rank")) === exp)
    appended.releaseDelta()
    base.release()
    ivf.release()
  }

  test("ivfPqAppendIngest: streamed PQ deltas + compaction keep the " +
      "staged exhaustive probe equal to brute force over the full " +
      "corpus; audit rows land per batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("pqing-ck").toString
    val delta = Files.createTempDirectory("pqing-delta").toString + "/d"
    val audit = Files.createTempDirectory("pqing-audit").toString
    val base = Similarity.buildIvfPqIndex(even, nCenters = 4, iters = 2,
      m = 4, ksub = 8)
    IndexStore.writeIvfPqIndex(base, "qm_ivfpq", buckets = 4)
    base.release()
    assert(IndexStore.readIvfPqIndexWithDelta(spark, "qm_ivfpq", delta)
      .cells.count() === even.count())
    val oddRows = odd.as[(Long, Seq[Float])].collect()
    val (b1, b2) = oddRows.splitAt(oddRows.length / 2)
    val mem = MemoryStream[(Long, Seq[Float])]
    def run() = graft.streaming.Streams.ivfPqAppendIngest(
      mem.toDF().toDF("vec_id", "embedding"), "qm_ivfpq", delta, audit,
      ckpt).awaitTermination()
    mem.addData(b1.toSeq: _*); run()
    mem.addData(b2.toSeq: _*); run()
    // staged exhaustive (all cells probed, exhaustive overfetch): the
    // exact re-rank tail makes the probe equal brute force over the
    // FULL corpus — the q_ivfpq_append guarantee through the stream
    val exact = rowsOf(Similarity.bruteForceTopK(q, vecs, k = 5)
      .select("query_id", "vec_id", "rank"))
    def probe(): Seq[String] = rowsOf(Similarity.ivfPqProbe(q,
      IndexStore.readIvfPqIndexWithDelta(spark, "qm_ivfpq", delta),
      vecs, k = 5, nProbe = 4, overfetch = 1 << 16)
      .select("query_id", "vec_id", "rank"))
    assert(probe() === exact)
    val auditDf = spark.read.parquet(audit)
    assert(auditDf.select("batch_id").distinct().count() === 2)
    assert(auditDf.columns.contains("tv_u6"))
    // generic compaction + crash-window + prune
    assert(IndexStore.compactIvfDeltas(spark, "qm_ivfpq", delta,
      buckets = 4) === 1L)
    assert(probe() === exact)
    assert(IndexStore.pruneFoldedDeltas(spark, "qm_ivfpq", delta) === 2)
    assert(probe() === exact)
  }
}
