package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Round-5 operator behavior: the winnowing lever on substring dedup and
  * the banded embedding near-pair path, each cross-checked against its
  * exact sibling.
  */
class Round5OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round5-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def randText(r: Random, n: Int): String =
    Seq.fill(n)(('a' + r.nextInt(26)).toChar).mkString

  test("winnowed duplicateSpans finds every span duplicated at >= k+window-1") {
    import spark.implicits._
    val k = 20; val w = 6
    val r = new Random(51)
    (1 to 5).foreach { trial =>
      val planted = randText(r, k + w - 1) // the minimum guaranteed length
      val docs = Seq(
        (1L, randText(r, 80) + planted + randText(r, 80)),
        (2L, randText(r, 120) + planted + randText(r, 40)),
        (3L, randText(r, 150))
      ).toDF("doc_id", "text")
      val got = Dedup.duplicateSpans(docs, k = k, minOcc = 2,
        window = Some(w))
        .select("gram").collect().map(_.getString(0))
      assert(got.exists(planted.contains(_)),
        s"trial $trial: planted span '$planted' not found via winnowing")
    }
  }

  test("winnowed spans/ranges are subsets of the exact enumeration") {
    import spark.implicits._
    val r = new Random(52)
    val shared = randText(r, 70)
    val docs = Seq(
      (1L, randText(r, 60) + shared + randText(r, 60)),
      (2L, randText(r, 90) + shared),
      (3L, randText(r, 140))
    ).toDF("doc_id", "text")
    val exact = Dedup.duplicateSpans(docs, k = 20)
      .select("gram").collect().map(_.getString(0)).toSet
    val winnowed = Dedup.duplicateSpans(docs, k = 20, window = Some(4))
      .select("gram").collect().map(_.getString(0)).toSet
    assert(winnowed.nonEmpty && winnowed.subsetOf(exact),
      "winnow-selected duplicated grams must be a strict filter of exact")

    // ranges: every winnowed range sits inside some exact range
    def ranges(win: Option[Int]) =
      Dedup.duplicateSpanRanges(docs, k = 20, window = win)
        .select("doc_id", "span_start", "span_end").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val exactR = ranges(None)
    assert(ranges(Some(4)).forall { case (d, s, e) =>
      exactR.exists { case (d2, s2, e2) => d2 == d && s2 <= s && e <= e2 }
    }, "winnowed ranges must be contained in exact ranges")
  }

  test("cosinePairs: exact-verified precision, high recall vs brute force") {
    // the q_emb_near_pairs_lsh configuration, cross-checked against the
    // exact cross-join baseline on the full sf0.001 embedding table
    // (deterministic: hyperplanes are seeded, data is fixed)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("_va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("_vb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        graft.functions.CorpusFunctions.cosine_sim(col("_va"), col("_vb")))
      .filter(col("cos") >= 0.3)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val banded = Similarity.cosinePairs(emb, threshold = 0.3,
      planes = 16, bands = 8)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(exact.nonEmpty)
    // precision is exactly 1: candidates are verified on true cosine
    assert(banded.subsetOf(exact), "banded pairs must all be true pairs")
    // 2-bit bands give ~0.97 per-pair recall at threshold 0.3; this
    // dataset's measured recall is stable (everything is seeded)
    val recall = banded.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below floor (|exact|=${exact.size})")
  }

  test("dedupLines: first corpus-wide occurrence survives, order preserved") {
    import spark.implicits._
    // line B is shared by all three docs (doc 1 pos 1 owns it); line C
    // repeats WITHIN doc 2 (first copy owns); doc 3 is all-duplicate and
    // rebuilds to ""
    val docs = Seq(
      (1L, "A\nB"),
      (2L, "C\nB\nC\nD"),
      (3L, "B\nC")
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.dedupLines(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_deduped"), r.getAs[Long]("n_lines_cut"))))
      .toMap
    assert(got(1L) == (("A\nB", 0L)))
    assert(got(2L) == (("C\nD", 2L)))
    assert(got(3L) == (("", 2L)))
  }

  test("dedupLinesIncremental: corpus lines cut everywhere, fresh keep-one") {
    import spark.implicits._
    val corpus = Seq((1L, "A\nB")).toDF("doc_id", "text")
    val idx = Dedup.lineIndex(corpus)
    val batch = Seq((10L, "B\nC"), (11L, "C\nD")).toDF("doc_id", "text")
    val got = Dedup.dedupLinesIncremental(idx, batch).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_deduped"), r.getAs[Long]("n_lines_cut"))))
      .toMap
    // B is corpus-known -> cut; C is fresh, doc 10 owns it; D fresh
    assert(got(10L) == (("C", 1L)))
    assert(got(11L) == (("D", 1L)))
  }

  test("semanticDedup: keep policy matches brute force per cell") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = graft.ops.Dedup.semanticDedup(emb, threshold = 0.3,
      nCenters = 8).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("center_id"),
        r.getAs[Boolean]("is_kept")))
    assert(out.length == emb.count())
    // re-derive the policy: within a cell, a vec is dropped iff some
    // smaller-id cell-mate has cosine >= threshold
    val vecs = emb.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val byCell = out.groupBy(_._2)
    byCell.values.foreach { members =>
      val ids = members.map(_._1).sorted
      members.foreach { case (id, _, kept) =>
        val expectDrop = ids.exists(o =>
          o < id && cos(vecs(o), vecs(id)) >= 0.3)
        assert(kept == !expectDrop, s"vec $id: kept=$kept expectDrop=$expectDrop")
      }
    }
    // the operator did something on this table (near-dup labels exist)
    assert(out.exists(!_._3) && out.count(_._3) > out.length / 2)

    // the prebuilt-index overload (build once, dedup many) agrees exactly:
    // the k-means build is deterministic, so both paths see the same cells
    val idx = Similarity.buildIvfIndex(emb, nCenters = 8, iters = 3)
    val viaIndex = graft.ops.Dedup.semanticDedup(idx, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("center_id"),
        r.getAs[Boolean]("is_kept"))).toSet
    idx.release()
    assert(viaIndex == out.toSet)
  }

  test("temperatureSample: surviving sizes track n^alpha, smallest keeps all") {
    import spark.implicits._
    // sources of size 400 / 100 / 25: with alpha=0.5 expected keeps are
    // 25*(400/25)^0.5=100, 25*(100/25)^0.5=50, 25
    val df = (
      (1 to 400).map(i => (i.toLong, "big")) ++
      (1 to 100).map(i => (1000L + i, "mid")) ++
      (1 to 25).map(i => (2000L + i, "small"))
    ).toDF("doc_id", "source")
    val kept = graft.ops.CorpusOps.temperatureSample(df, "source", "doc_id",
      alpha = 0.5)
    val sizes = kept.groupBy("source").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(sizes("small") == 25, "smallest source must keep everything")
    // md5-fraction is uniform: binomial(400, 0.25) and binomial(100, 0.5)
    // stay within 5 sigma of the mean
    assert(math.abs(sizes("big") - 100.0) < 5 * math.sqrt(400 * .25 * .75),
      s"big kept ${sizes("big")}")
    assert(math.abs(sizes("mid") - 50.0) < 5 * math.sqrt(100 * .5 * .5),
      s"mid kept ${sizes("mid")}")
    // deterministic: same rows on a rerun
    val again = graft.ops.CorpusOps.temperatureSample(df, "source", "doc_id",
      alpha = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
    // alpha=1 is the natural distribution: nothing dropped
    assert(graft.ops.CorpusOps.temperatureSample(df, "source", "doc_id",
      alpha = 1.0).count() == 525)
  }

  test("repetitionStats: hand-computed Gopher fractions") {
    import spark.implicits._
    // doc 1: lines [X, Y, X] (X="ab cd", Y="ef") -> dup lines 2/3,
    // dup chars (5+5)/(5+5+2)=10/12; bigram stream of the whole text:
    // "ab cd","cd ef","ef ab","ab cd" -> top = "ab cd" (count 2, len 5),
    // text len = 14 -> 10/14
    val docs = Seq(
      (1L, "ab cd\nef\nab cd"),
      (2L, "u v w")
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.repetitionStats(docs, n = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_lines") == 3L)
    assert(r1.getAs[Long]("dup_line_frac_u6") == math.floor(2.0 / 3 * 1e6).toLong)
    assert(r1.getAs[Long]("dup_line_char_frac_u6")
      == math.floor(10.0 / 12 * 1e6).toLong)
    assert(r1.getAs[String]("top_gram") == "ab cd")
    assert(r1.getAs[Long]("top_gram_char_frac_u6")
      == math.floor(2 * 5.0 / 14 * 1e6).toLong)
    // doc 2: no repeats; tie on count 1 breaks to smallest gram "u v"
    val r2 = got(2L)
    assert(r2.getAs[Long]("dup_line_frac_u6") == 0L)
    assert(r2.getAs[String]("top_gram") == "u v")
  }

  test("sourceTokenBudget: boundary doc kept, small sources whole") {
    import spark.implicits._
    // "big" docs are 10 tokens each; budget 25 keeps docs while the
    // EXCLUSIVE cumsum is < 25 -> exactly 3 docs (0, 10, 20 all < 25; the
    // third crosses and is kept, the fourth starts at 30 and is cut).
    // "tiny" totals 6 tokens -> kept whole.
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = ((1 to 8).map(i => (i.toLong, "big", ten)) ++
      Seq((100L, "tiny", "a b c"), (101L, "tiny", "d e f")))
      .toDF("doc_id", "source", "text")
    val kept = graft.ops.CorpusOps.sourceTokenBudget(df, "source", "doc_id",
      "text", budget = 25)
    val bySrc = kept.groupBy("source").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(bySrc("big") == 3, s"big kept ${bySrc("big")} docs, expected 3")
    assert(bySrc("tiny") == 2, "sources under budget must keep everything")
    // deterministic: the kept prefix is the md5-order prefix, so a rerun
    // (and any repartitioning) picks the same rows
    val again = graft.ops.CorpusOps.sourceTokenBudget(df.repartition(7),
      "source", "doc_id", "text", budget = 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("real ImageIO decode: golden pixels through resize and features") {
    import spark.implicits._
    import graft.ops.Multimodal
    import graft.ops.Multimodal.Asset
    // a solid-color PNG: bilinear resample of a constant is the constant,
    // so every output pixel is knowable exactly
    val red = 0xc84614
    val solid = Multimodal.pngBytes(64, 48, (_, _) => red)
    val white = Multimodal.pngBytes(40, 40, (_, _) => 0xffffff)
    val assets = Seq(
      Asset(1L, "image", solid, "image/png", 64, 48, 0L),
      // metadata LIES (10x10): the real path must use decoded dims
      Asset(2L, "image", white, "image/png", 10, 10, 0L),
      // undecodable payload: declared stub path, metadata dims
      Asset(3L, "image", Array.tabulate[Byte](400)(_.toByte), "image/png",
        20, 20, 0L)).toDS()
    val got = Multimodal.resizeImages(assets, 32, 32).collect()
      .map(r => r.asset_id -> r).toMap
    // 64x48 -> 0.5 scale -> 32x24, still solid red after resample
    assert((got(1L).width, got(1L).height) == ((32, 24)))
    val img1 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got(1L).bytes))
    assert((img1.getWidth, img1.getHeight) == ((32, 24)))
    for (x <- 0 until 32; y <- 0 until 24)
      assert((img1.getRGB(x, y) & 0xffffff) == red,
        s"pixel ($x,$y) not the solid color")
    // decoded dims (40x40 -> 32x32) beat the lying 10x10 metadata
    assert((got(2L).width, got(2L).height) == ((32, 32)))
    // stub path: 20x20 metadata -> 20x20 inside the box, bytes untouched
    assert((got(3L).width, got(3L).height) == ((20, 20)))
    assert(got(3L).bytes.length == 400)

    // features: solid white decodes to luminance 1.0 in every bucket
    val feats = Multimodal.extractFeatures(
      Seq(Asset(9L, "image", white, "image/png", 40, 40, 0L)).toDS(),
      dim = 8).head().feature
    assert(feats.length == 8 && feats.forall(f => math.abs(f - 1.0f) < 1e-3))
  }
}
