package graft

import java.nio.file.Files

import graft.ops.{IndexStore, Pipelines}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** O(batch) curation-state maintenance: curatedDeltaLandingIngest lands
  * one admitted-rows artifact per batch and readCorpusStateWithDelta
  * derives every state view from base ∪ live deltas — admissions must
  * equal the sequential batch operator's (state threading included:
  * cross-batch exact/near duplicates rejected THROUGH the delta state),
  * the replay exclusion must reproduce the pre-batch view, and
  * compaction + prune must not change any later admission.
  */
class CorpusStateDeltaSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("csdelta-wh").toString)
    .config("spark.ui.enabled", "false")
    .appName("corpus-state-delta-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val docs: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  private def admittedIds(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("curatedDeltaLandingIngest: streamed admissions equal the " +
      "sequential batch operator's (cross-batch dups rejected through " +
      "the delta state); replay exclusion reproduces the pre-batch " +
      "view; compaction + prune leave later curation unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("csdelta-ck").toString
    val sdelta = Files.createTempDirectory("csdelta-sd").toString + "/d"
    val out = Files.createTempDirectory("csdelta-out").toString
    val eval = docs.limit(0)
    // day-0 base: the EMPTY persisted state (parameters ride the meta)
    IndexStore.writeCorpusState(
      Pipelines.initCorpusState(docs.limit(0)), "cs_state", buckets = 4)
    val b1 = docs.filter(col("doc_id") < 30)
    // batch 2 carries cross-batch EXACT duplicates (same text, new ids:
    // only the DELTA state can reject them) and fresh docs
    val dups = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val b2 = docs.filter(col("doc_id") >= 30 && col("doc_id") < 60)
      .unionByName(dups)
    def curate(state: Pipelines.CorpusState, batch: DataFrame) =
      Pipelines.curateBatch(state, batch, eval,
        minQuality = 0.0, maxRepetition = 0.9, nearDupThreshold = 0.7,
        audit = false)
    // expected: the sequential batch operator with threaded state
    val r1 = curate(Pipelines.initCorpusState(docs.limit(0)), b1)
    val r2 = curate(r1.state, b2)
    assert(admittedIds(r1.admitted).nonEmpty)
    // the planted duplicates must be rejected BY STATE (not in-batch)
    assert(admittedIds(r2.admitted).intersect(
      Set(1000L, 1001L, 1002L, 1003L, 1004L)).isEmpty)

    val mem = MemoryStream[(Long, String)]
    def run() = graft.streaming.Streams.curatedDeltaLandingIngest(
      mem.toDF().toDF("doc_id", "text"), eval, "cs_state", sdelta, out,
      ckpt, minQuality = 0.0, maxRepetition = 0.9,
      nearDupThreshold = 0.7).awaitTermination()
    mem.addData(b1.as[(Long, String)].collect().toSeq: _*); run()
    mem.addData(b2.as[(Long, String)].collect().toSeq: _*); run()
    val landed = spark.read.parquet(sdelta)
    assert(admittedIds(landed.filter(col("batch_id") === 0L)) ===
      admittedIds(r1.admitted))
    assert(admittedIds(landed.filter(col("batch_id") === 1L)) ===
      admittedIds(r2.admitted))
    // replay-idempotence hook: excluding batch 1 reproduces exactly the
    // state batch 1's first attempt read (base ∪ batch-0 admissions)
    val replayView = IndexStore.readCorpusStateWithDelta(spark,
      "cs_state", sdelta, excludeBatchId = Some(1L))
    assert(replayView.fingerprints.count() === r1.state.fingerprints.count())
    assert(replayView.minhash.sigs.count() === r1.admitted.count())
    // a third batch must curate IDENTICALLY against (a) the live delta
    // state, (b) the compacted state with the folded tree still on disk
    // (the crash window), and (c) the pruned state — and all three must
    // equal the sequential operator
    val b3 = docs.filter(col("doc_id") >= 60 && col("doc_id") < 80)
      .unionByName(docs.filter(col("doc_id") >= 30 && col("doc_id") < 35)
        .select((col("doc_id") + 2000L).as("doc_id"), col("text")))
    val expected3 = admittedIds(curate(r2.state, b3).admitted)
    def curateVsDelta(): Set[Long] = admittedIds(curate(
      IndexStore.readCorpusStateWithDelta(spark, "cs_state", sdelta),
      b3).admitted)
    assert(curateVsDelta() === expected3)
    assert(IndexStore.compactCorpusStateDeltas(spark, "cs_state", sdelta,
      buckets = 4) === 1L)
    assert(curateVsDelta() === expected3)
    assert(IndexStore.pruneFoldedDeltas(spark, "cs_state", sdelta) === 2)
    assert(curateVsDelta() === expected3)
    // the plain reader resolves the compacted generation: its
    // fingerprint set equals the sequential operator's threaded state
    val compacted = IndexStore.readCorpusState(spark, "cs_state")
    assert(compacted.fingerprints.count() ===
      r2.state.fingerprints.count())
    // line counts folded ADDITIVELY (the one aggregated view)
    assert(compacted.lines.agg(sum(col("n_occ"))).head().getLong(0) ===
      r2.state.lines.agg(sum(col("n_occ"))).head().getLong(0))
    // md5-seam staged states are refused on the production delta path
    IndexStore.writeCorpusState(
      Pipelines.initCorpusState(docs.limit(0), numHashes = 0, bands = 1)
        .copy(minhash = graft.ops.Dedup.buildMinhashIndex(docs.limit(0),
          numHashes = 0, bands = 1, md5Seam = true)),
      "cs_seamed", buckets = 4)
    val e = intercept[IllegalArgumentException] {
      IndexStore.readCorpusStateWithDelta(spark, "cs_seamed", sdelta)
    }
    assert(e.getMessage.contains("production path"))
  }
}
