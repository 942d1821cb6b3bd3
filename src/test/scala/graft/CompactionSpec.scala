package graft

import java.nio.file.Files

import graft.ops.{IndexStore, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Crash-safe delta compaction (the commit-last generation recipe) and
  * NSW maintenance parity:
  *
  *  - a compacted index probes EXACTLY-ONCE with the folded delta tree
  *    still on disk (the crash window between the commit marker and the
  *    lazy cleanup), and pruning it afterwards changes nothing;
  *  - a compaction that crashed BEFORE its commit marker is invisible —
  *    readers fall back to the previous base plus all live deltas, and
  *    a re-run converges;
  *  - the compacted base regains the zero-Exchange bucketed plan;
  *  - nswAppendIngest reproduces the batch append operator exactly
  *    (edge-set equality per streamed batch), lands one drift-audit row
  *    per batch, and compaction/pruning preserve the merged graph.
  */
class CompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("compact-wh").toString)
    .config("spark.ui.enabled", "false")
    .appName("compaction-spec").getOrCreate()

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

  lazy val docs: DataFrame = {
    import spark.implicits._
    (0 until 120).map { i =>
      val fam = i % 8
      (i.toLong, s"family $fam shared sentence body token$fam alpha beta " +
        s"gamma" + (if (i % 3 == 0) s" unique$i" else ""))
    }.toDF("doc_id", "text")
  }

  /** Land `parts` as batch_id-partitioned delta partitions (the
    * writeBatchIdempotent tree shape) under a fresh directory.
    */
  private def writeDelta(parts: Seq[(Long, DataFrame)], tag: String): String = {
    val path = Files.createTempDirectory(s"compact-$tag").toString + "/d"
    parts.foreach { case (id, df) =>
      df.withColumn("batch_id", lit(id))
        .write.mode("append").partitionBy("batch_id").parquet(path)
    }
    path
  }

  test("compactIvfDeltas: exactly-once with the folded delta tree still " +
      "on disk; zero-Exchange plan restored; prune is pure hygiene; " +
      "re-compaction is a no-op") {
    val even = vecs.filter(col("vec_id") % 2 === 0)
    val odd = vecs.filter(col("vec_id") % 2 === 1)
    val base = Similarity.buildIvfIndex(even, nCenters = 4, iters = 2)
    IndexStore.writeIvfIndex(base, "c_ivf", buckets = 4)
    val Array(o1, o2) = odd.randomSplit(Array(0.5, 0.5), seed = 7)
    val delta = writeDelta(Seq(
      0L -> Similarity.ivfAssign(o1, base),
      1L -> Similarity.ivfAssign(o2, base)), "ivf")
    base.release()
    val q = vecs.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = rowsOf(Similarity.bruteForceTopK(q, vecs, k = 5)
      .select("query_id", "vec_id", "rank"))

    assert(IndexStore.compactIvfDeltas(spark, "c_ivf", delta,
      buckets = 4) === 1L)
    // CRASH WINDOW: the folded partitions are still on disk — the
    // reader must skip them (a double-count would duplicate every odd
    // vector in the ranking and inflate the cell count)
    val merged = IndexStore.readIvfIndexWithDelta(spark, "c_ivf", delta)
    assert(merged.cells.count() === vecs.count())
    assert(rowsOf(Similarity.ivfProbe(q, merged, k = 5, nProbe = 4)
      .select("query_id", "vec_id", "rank")) === exact)
    // the delta-free reader resolves the committed generation too
    assert(IndexStore.readIvfIndex(spark, "c_ivf").cells.count() ===
      vecs.count())
    // plan: a probe join against the compacted generation reads
    // pre-shuffled — no Exchange in the cells subtree
    val probed = q.crossJoin(
        broadcast(spark.table("c_ivf_centroids")))
      .select(col("query_id"), col("center_id"))
    val cands = probed.join(spark.table("c_ivf_gen1_cells"),
      Seq("center_id"))
    cands.write.format("noop").mode("overwrite").save()
    val plan = cands.queryExecution.executedPlan.toString
    val scanIdx = plan.indexOf("c_ivf_gen1_cells")
    assert(scanIdx > 0, s"expected the generation scan in:\n$plan")
    val joinIdx = plan.indexOf("SortMergeJoin")
    if (joinIdx >= 0) {
      assert(!plan.substring(joinIdx, scanIdx)
        .contains("Exchange hashpartitioning"),
        s"compacted cells must read pre-shuffled:\n$plan")
    }
    // re-compaction with nothing new: no-op, same high-water, no new gen
    assert(IndexStore.compactIvfDeltas(spark, "c_ivf", delta,
      buckets = 4) === 1L)
    assert(!spark.catalog.tableExists("c_ivf_gen2_commit"))
    // prune reclaims exactly the two folded partitions; reads unchanged
    assert(IndexStore.pruneFoldedDeltas(spark, "c_ivf", delta) === 2)
    assert(IndexStore.pruneFoldedDeltas(spark, "c_ivf", delta) === 0)
    val after = IndexStore.readIvfIndexWithDelta(spark, "c_ivf", delta)
    assert(after.cells.count() === vecs.count())
    assert(rowsOf(Similarity.ivfProbe(q, after, k = 5, nProbe = 4)
      .select("query_id", "vec_id", "rank")) === exact)
    // the stream CONTINUES after compaction: a new batch lands above
    // the high-water and is unioned in; nothing else double-counts
    import spark.implicits._
    val late = (1000 until 1010).map { i =>
      val v = Array.tabulate(16)(dd =>
        (math.sin(i * 0.37 + dd) + (if (dd == i % 4) 2.0 else 0.0)).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    Similarity.ivfAssign(late,
        IndexStore.readIvfIndex(spark, "c_ivf"))
      .withColumn("batch_id", lit(2L))
      .write.mode("append").partitionBy("batch_id").parquet(delta)
    val withLate = IndexStore.readIvfIndexWithDelta(spark, "c_ivf", delta)
    assert(withLate.cells.count() === vecs.count() + 10)
    // a second compaction folds ONLY the live batch and the reader
    // stays exactly-once
    assert(IndexStore.compactIvfDeltas(spark, "c_ivf", delta,
      buckets = 4) === 2L)
    assert(IndexStore.readIvfIndexWithDelta(spark, "c_ivf", delta)
      .cells.count() === vecs.count() + 10)
  }

  test("a compaction that crashed before its commit marker is invisible " +
      "(base + all deltas still read exactly-once) and the re-run " +
      "converges") {
    val even = vecs.filter(col("vec_id") % 2 === 0)
    val odd = vecs.filter(col("vec_id") % 2 === 1)
    val base = Similarity.buildIvfIndex(even, nCenters = 4, iters = 2)
    IndexStore.writeIvfIndex(base, "c_ivf_crash", buckets = 4)
    val delta = writeDelta(Seq(0L -> Similarity.ivfAssign(odd, base)),
      "ivfcrash")
    base.release()
    // run the real compaction, then DROP the commit marker — byte-for-
    // byte the on-disk state of a crash after the base rewrite and
    // before the commit (the marker is written last)
    assert(IndexStore.compactIvfDeltas(spark, "c_ivf_crash", delta,
      buckets = 4) === 0L)
    spark.sql("DROP TABLE c_ivf_crash_gen1_commit")
    // the orphaned generation is invisible: the reader falls back to
    // the ORIGINAL base plus the (still-live) delta — exactly-once
    val fallback = IndexStore.readIvfIndexWithDelta(spark, "c_ivf_crash",
      delta)
    assert(fallback.cells.count() === vecs.count())
    // pruning is inert while nothing is committed
    assert(IndexStore.pruneFoldedDeltas(spark, "c_ivf_crash", delta) === 0)
    // the re-run lands a FRESH generation (never overwriting the orphan)
    // and converges to the same exactly-once state
    assert(IndexStore.compactIvfDeltas(spark, "c_ivf_crash", delta,
      buckets = 4) === 0L)
    assert(spark.catalog.tableExists("c_ivf_crash_gen2_commit"))
    val merged = IndexStore.readIvfIndexWithDelta(spark, "c_ivf_crash",
      delta)
    assert(merged.cells.count() === vecs.count())
  }

  test("compactPostingsDeltas: the compacted index probes bit-equal to " +
      "a full rebuild across the crash window and after prune") {
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val base = TextAnalysis.buildPostingsIndex(even)
    IndexStore.writePostingsIndex(base, "c_post", buckets = 4)
    base.release()
    val Array(d1, d2) = odd.randomSplit(Array(0.5, 0.5), seed = 7)
    def tf(df: DataFrame): DataFrame =
      TextAnalysis.postingsOf(df, "doc_id", "text").postings
    val delta = writeDelta(Seq(0L -> tf(d1), 1L -> tf(d2)), "post")
    assert(IndexStore.compactPostingsDeltas(spark, "c_post", delta,
      buckets = 4) === 1L)
    val qs = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text"))
    val full = TextAnalysis.buildPostingsIndex(docs)
    val exp = rowsOf(TextAnalysis.bm25Probe(full, qs))
    // crash window: folded partitions still on disk, reader skips them
    val merged = IndexStore.readPostingsIndexWithDelta(spark, "c_post",
      delta)
    assert(merged.docLens.count() === docs.count())
    assert(rowsOf(TextAnalysis.bm25Probe(merged, qs)) === exp)
    // the delta-free reader resolves the generation
    assert(rowsOf(TextAnalysis.bm25Probe(
      IndexStore.readPostingsIndex(spark, "c_post"), qs)) === exp)
    assert(IndexStore.pruneFoldedDeltas(spark, "c_post", delta) === 2)
    assert(rowsOf(TextAnalysis.bm25Probe(
      IndexStore.readPostingsIndexWithDelta(spark, "c_post", delta),
      qs)) === exp)
    full.release()
  }

  test("nswAppendIngest: each streamed batch reproduces the batch append " +
      "operator's edge set, audit rows land per batch, and " +
      "compaction + prune preserve the merged graph and delta vectors") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("nswing-ck").toString
    val delta = Files.createTempDirectory("nswing-delta").toString + "/d"
    val audit = Files.createTempDirectory("nswing-audit").toString
    val even = vecs.filter(col("vec_id") % 2 === 0)
    val odd = vecs.filter(col("vec_id") % 2 === 1)
      .withColumn("vec_id", col("vec_id") + 1000L)
    val base = Similarity.buildNswGraph(even, nCenters = 4)
    IndexStore.writeNswIndex(base, "c_nsw", buckets = 4)
    // the readers tolerate the not-yet-existing delta tree
    assert(IndexStore.readNswIndexWithDelta(spark, "c_nsw", delta)
      .edges.count() === base.edges.count())
    assert(IndexStore.readNswDeltaVectors(spark, "c_nsw", delta).isEmpty)
    val oddRows = odd.as[(Long, Seq[Float])].collect()
    val (b1, b2) = oddRows.splitAt(oddRows.length / 2)
    val mem = MemoryStream[(Long, Seq[Float])]
    def run() = graft.streaming.Streams.nswAppendIngest(
      mem.toDF().toDF("vec_id", "embedding"), "c_nsw", even, delta,
      audit, ckpt).awaitTermination()
    mem.addData(b1.toSeq: _*); run()
    mem.addData(b2.toSeq: _*); run()
    def edgeSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)].collect().toSet
    // expected: replay the BATCH operator (nswAppend, same parameters)
    // batch by batch — the stream must reproduce it exactly
    val b1df = b1.toSeq.toDF("vec_id", "embedding")
    val b2df = b2.toSeq.toDF("vec_id", "embedding")
    val after1 = Similarity.nswAppend(base, b1df, even)
    val after2 = Similarity.nswAppend(after1, b2df,
      even.unionByName(b1df))
    val expected = edgeSet(after2.edges)
    val streamed = IndexStore.readNswIndexWithDelta(spark, "c_nsw", delta)
    assert(edgeSet(streamed.edges) === expected)
    // the appended vectors ride the same delta rows
    val dv = IndexStore.readNswDeltaVectors(spark, "c_nsw", delta)
    assert(dv.isDefined)
    assert(dv.get.select("vec_id").as[Long].collect().toSet ===
      oddRows.map(_._1).toSet)
    // one drift-audit row per batch, integer signals populated: every
    // batch vector found neighbors (full reach), and growth is the
    // CUMULATIVE appended share (built count from the persisted meta) —
    // strictly increasing across batches, so the rebuild threshold is
    // reachable under micro-batch cadence
    val auditDf = spark.read.parquet(audit)
    assert(auditDf.count() === 2)
    assert(auditDf.filter(col("reach_u6") === 1000000L).count() === 2)
    assert(auditDf.filter(col("n_reached") === col("n_batch")).count() === 2)
    assert(auditDf.filter(col("n_built_edges") ===
      base.edges.count()).count() === 2)
    val growths = auditDf.orderBy("batch_id")
      .select("growth_u6").as[Long].collect()
    assert(growths.forall(g => g > 0L && g < 1000000L))
    assert(growths(1) > growths(0), s"cumulative growth must rise: " +
      growths.mkString(","))
    // replay idempotence hook: excluding a batch id reads the graph /
    // vectors exactly as that batch's FIRST attempt saw them, so a
    // replayed foreachBatch recomputes identical neighbor lists and
    // rewrites its own partition bit-for-bit
    assert(edgeSet(IndexStore.readNswIndexWithDelta(spark, "c_nsw", delta,
      excludeBatchId = Some(1L)).edges) === edgeSet(after1.edges))
    assert(IndexStore.readNswDeltaVectors(spark, "c_nsw", delta,
        excludeBatchId = Some(1L))
      .get.select("vec_id").as[Long].collect().toSet ===
      b1.map(_._1).toSet)
    // compaction folds edges AND vectors into the generation; the
    // leftover delta tree is skipped, then pruned
    assert(IndexStore.compactNswDeltas(spark, "c_nsw", delta,
      buckets = 4) === 1L)
    assert(edgeSet(IndexStore.readNswIndexWithDelta(spark, "c_nsw", delta)
      .edges) === expected)
    assert(IndexStore.pruneFoldedDeltas(spark, "c_nsw", delta) === 2)
    assert(edgeSet(IndexStore.readNswIndexWithDelta(spark, "c_nsw", delta)
      .edges) === expected)
    val dvAfter = IndexStore.readNswDeltaVectors(spark, "c_nsw", delta)
    assert(dvAfter.get.select("vec_id").as[Long].collect().toSet ===
      oddRows.map(_._1).toSet)
    // frontier join against the compacted adjacency reads pre-shuffled
    val frontier = even.limit(4)
      .select(col("vec_id").as("query_id"), col("vec_id").as("src"))
    val hop = frontier.join(spark.table("c_nsw_gen1_edges"), Seq("src"))
    hop.write.format("noop").mode("overwrite").save()
    val plan = hop.queryExecution.executedPlan.toString
    val scanIdx = plan.indexOf("c_nsw_gen1_edges")
    assert(scanIdx > 0, s"expected the generation scan in:\n$plan")
    val joinIdx = plan.indexOf("SortMergeJoin")
    if (joinIdx >= 0 && joinIdx < scanIdx) {
      assert(!plan.substring(joinIdx, scanIdx)
        .contains("Exchange hashpartitioning"),
        s"compacted edges must read pre-shuffled:\n$plan")
    }
    after1.releaseDelta(); after2.releaseDelta(); base.release()
  }

  test("a REBUILD over a compacted prefix resets the generation lineage " +
      "— the retrained base is what readers resolve, not the stale " +
      "newest generation") {
    val even = vecs.filter(col("vec_id") % 2 === 0)
    val base = Similarity.buildIvfIndex(even, nCenters = 4, iters = 2)
    IndexStore.writeIvfIndex(base, "c_ivf_rb", buckets = 4)
    val delta = writeDelta(Seq(0L -> Similarity.ivfAssign(
      vecs.filter(col("vec_id") % 2 === 1), base)), "ivfrb")
    base.release()
    assert(IndexStore.compactIvfDeltas(spark, "c_ivf_rb", delta,
      buckets = 4) === 0L)
    assert(spark.catalog.tableExists("c_ivf_rb_gen1_commit"))
    // retrain cadence: a FULL rebuild lands under the same prefix with
    // a fresh delta tree (the stream redeploys); the stale generation
    // must not shadow it
    val retrained = Similarity.buildIvfIndex(vecs, nCenters = 4, iters = 2)
    IndexStore.writeIvfIndex(retrained, "c_ivf_rb", buckets = 4)
    retrained.release()
    assert(!spark.catalog.tableExists("c_ivf_rb_gen1_commit"))
    assert(IndexStore.readIvfIndex(spark, "c_ivf_rb").cells.count() ===
      vecs.count())
    val fresh = Files.createTempDirectory("compact-ivfrb2").toString + "/d"
    assert(IndexStore.readIvfIndexWithDelta(spark, "c_ivf_rb", fresh)
      .cells.count() === vecs.count())
  }

  test("nswDriftReport: full reach on a connected graph; an empty entry " +
      "set flags degrade; an empty batch is no evidence; growth past " +
      "the threshold recommends rebuild") {
    import spark.implicits._
    val corpus = vecs.filter(col("vec_id") < 80)
    val idx = Similarity.buildNswGraph(corpus, nCenters = 4)
    val batch = vecs.filter(col("vec_id") >= 80 && col("vec_id") < 96)
      .withColumn("vec_id", col("vec_id") + 1000L)
    // row: (n_batch, n_reached, n_new_edges, n_index_edges,
    //       n_built_edges, reach_u6, growth_u6, degrade)
    val r = Similarity.nswDriftReport(idx, batch, corpus)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].head()
    assert(r._1 === 16L && r._2 === 16L) // every vector reached the graph
    assert(r._6 === 1000000L)            // reach_u6
    assert(r._3 > 0L && r._7 > 0L)       // new edges, appended share
    assert(r._5 === r._4)                // one-shot: built = index
    // an empty entry set means NO batch vector can attach — the
    // recall-collapse failure mode the reach signal exists to catch
    val dead = Similarity.nswDriftReport(idx, batch, corpus,
      entries = Some(corpus.select("vec_id").limit(0)))
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].head()
    assert(dead._2 === 0L && dead._6 === 0L && dead._8)
    // empty batch: no evidence is not drift
    val none = Similarity.nswDriftReport(idx, batch.limit(0), corpus)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].head()
    assert(none._1 === 0L && !none._8)
    // a batch large relative to the graph trips the growth signal even
    // at full reach
    val big = Similarity.nswDriftReport(idx, batch, corpus,
      growthThresholdU6 = 1L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].head()
    assert(big._6 === 1000000L && big._8)
    idx.release()
  }
}
