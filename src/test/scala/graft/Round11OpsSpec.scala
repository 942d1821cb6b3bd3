package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 hardening: the append/drift dictionary paths guard their
  * batch-vocabulary broadcasts behind a size cap (the shuffle fallback
  * must produce the identical merged dictionary/report), and the
  * md5-seam builders reject a live signature (the mixed-hash-lattice
  * configuration the seam exists to remove).
  */
class Round11OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round11-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs(): DataFrame = {
    import spark.implicits._
    (0 until 40).map(i =>
        (i.toLong, s"shared tokens every doc t${i % 7} uniq$i extra" +
          (" pad" * (i % 3))))
      .toDF("doc_id", "text")
  }

  test("appendPostingsIndex past the broadcast cap: the shuffle-merge " +
      "fallback builds the identical dictionary/stats and probes equal") {
    import graft.ops.TextAnalysis
    val d = docs()
    val base = TextAnalysis.buildPostingsIndex(d.filter(col("doc_id") < 20))
    val batch = d.filter(col("doc_id") >= 20)
    // cap = 0 forces the shuffle aggregation; the default takes the
    // broadcast bump/anti-join path — the merged artifacts must agree
    val viaBroadcast = TextAnalysis.appendPostingsIndex(base, batch)
    val viaShuffle = TextAnalysis.appendPostingsIndex(base, batch,
      broadcastTermCap = 0L)
    def dfSet(ix: TextAnalysis.PostingsIndex): Set[(String, Long)] = {
      import spark.implicits._
      ix.docFreqs.as[(String, Long)].collect().toSet
    }
    assert(dfSet(viaShuffle) === dfSet(viaBroadcast))
    assert(viaShuffle.stats.select("_n", "_sum_dl").collect().toSeq ===
      viaBroadcast.stats.select("_n", "_sum_dl").collect().toSeq)
    import spark.implicits._
    val qs = Seq((1L, "shared uniq25 t3")).toDF("query_id", "text")
    val pb = TextAnalysis.bm25Probe(viaBroadcast, qs, k = 5)
      .collect().toSeq
    val ps = TextAnalysis.bm25Probe(viaShuffle, qs, k = 5)
      .collect().toSeq
    assert(ps === pb)
    viaBroadcast.releaseDelta()
    viaShuffle.releaseDelta()
    base.release()
  }

  test("postingsDriftReport past the broadcast cap: the unhinted-join " +
      "fallback reports the identical integer row") {
    import graft.ops.TextAnalysis
    val d = docs()
    val idx = TextAnalysis.buildPostingsIndex(d.filter(col("doc_id") < 20))
    val batch = d.filter(col("doc_id") >= 20)
    val a = TextAnalysis.postingsDriftReport(idx, batch).collect().toSeq
    val b = TextAnalysis.postingsDriftReport(idx, batch,
      broadcastTermCap = 0L).collect().toSeq
    assert(a === b && a.size === 1)
    idx.release()
  }

  test("releaseDelta ownership rule: freeing an appended index's " +
      "per-append blocks leaves the shared base fully probe-able, for " +
      "BOTH the vector and the lexical family") {
    import spark.implicits._
    import graft.ops.{Similarity, TextAnalysis}
    val d = docs()
    // lexical: append pins legs + merged dictionary/stats — all
    // append-owned; the base's own blocks must survive their release
    val pBase = TextAnalysis.buildPostingsIndex(d.filter(col("doc_id") < 20))
    val qs = Seq((1L, "shared t3")).toDF("query_id", "text")
    val before = TextAnalysis.bm25Probe(pBase, qs).collect().toSeq
    val appended = TextAnalysis.appendPostingsIndex(pBase,
      d.filter(col("doc_id") >= 20))
    appended.releaseDelta()
    assert(TextAnalysis.bm25Probe(pBase, qs).collect().toSeq === before)
    pBase.release()
    // vector: append pins only its batch leg
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 0.3 + j).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val vBase = Similarity.buildIvfIndex(
      vecs.filter(col("vec_id") < 40), nCenters = 4, iters = 2)
    val q = vecs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val vBefore = Similarity.ivfProbe(q, vBase, k = 3, nProbe = 4)
      .collect().map(_.toString).sorted.toSeq
    val vApp = Similarity.ivfAppend(vBase, vecs.filter(col("vec_id") >= 40))
    vApp.releaseDelta()
    assert(Similarity.ivfProbe(q, vBase, k = 3, nProbe = 4)
      .collect().map(_.toString).sorted.toSeq === vBefore)
    vBase.release()
  }

  test("md5Seam with a live signature fails loudly in both builders " +
      "(mixed murmur-prune/md5-verify lattices are rejected)") {
    import graft.ops.Dedup
    val d = docs()
    val e1 = intercept[IllegalArgumentException] {
      Dedup.minhashLsh(d, numHashes = 128, bands = 32, md5Seam = true)
    }
    assert(e1.getMessage.contains("numHashes = 0"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.buildMinhashIndex(d, numHashes = 128, bands = 32,
        md5Seam = true)
    }
    assert(e2.getMessage.contains("numHashes = 0"))
    // the staged configuration stays valid
    assert(Dedup.minhashLsh(d, threshold = 0.99, numHashes = 0, bands = 1,
      md5Seam = true).columns.length === 3)
  }
}
