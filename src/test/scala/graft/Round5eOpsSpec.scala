package graft

import graft.ops.{CorpusOps, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Fifth round-5 operator batch: Naive Bayes classification and CCNet
  * score buckets.
  */
class Round5eOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round5e-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("trainNaiveBayes counts terms per class; minCount prunes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam", "buy now buy"),
      (2L, "spam", "buy cheap"),
      (3L, "ham", "hello friend hello")
    ).toDF("doc_id", "label", "text")
    val m = TextAnalysis.trainNaiveBayes(docs, "label", minCount = 2L)
    val terms = m.terms.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // retained: buy(spam)=3, hello(ham)=2; now/cheap/friend drop at n=1
    assert(terms == Map(("buy", "spam") -> 3L, ("hello", "ham") -> 2L))
    val cls = m.classes.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(cls == Map("spam" -> ((2L, 3L)), "ham" -> ((1L, 2L))))
    m.release()
  }

  test("classifyNaiveBayes: hand-computed smoothing, priors, argmax") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam", "buy now buy"),
      (2L, "spam", "buy cheap"),
      (3L, "ham", "hello friend hello")
    ).toDF("doc_id", "label", "text")
    val m = TextAnalysis.trainNaiveBayes(docs, "label", minCount = 2L)
    val test = Seq((10L, "buy buy"), (11L, "hello"), (12L, "unseen words"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.classifyNaiveBayes(test, m).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap

    // model: V = 2, priors spam 2/3 ham 1/3, N_spam = 3, N_ham = 2
    def round6(x: Double) = math.round(x * 1e6) / 1e6
    // doc 10 "buy buy": spam = ln(2/3) + 2 ln((3+1)/(3+2+1)) = ln(2/3)+2ln(4/6)
    //                   ham  = ln(1/3) + 2 ln((0+1)/(2+2+1)) = ln(1/3)+2ln(1/5)
    val spam10 = math.log(2.0 / 3) + 2 * math.log(4.0 / 6)
    val ham10 = math.log(1.0 / 3) + 2 * math.log(1.0 / 5)
    assert(spam10 > ham10)
    assert(got(10L)._1 == 2L && got(10L)._2 == "spam")
    assert(math.abs(got(10L)._3 - round6(spam10)) < 1e-9)

    // doc 11 "hello": ham = ln(1/3) + ln((2+1)/5); spam = ln(2/3) + ln(1/6)
    val ham11 = math.log(1.0 / 3) + math.log(3.0 / 5)
    assert(got(11L)._2 == "ham")
    assert(math.abs(got(11L)._3 - round6(ham11)) < 1e-9)

    // doc 12 all-OOV: spam = ln(2/3) + 2 ln(1/6) = ln(2/3) - 2 ln 6
    //                 ham  = ln(1/3) + 2 ln(1/5): spam prior + smaller
    //                 denom penalty -> compute, not assume
    val spam12 = math.log(2.0 / 3) + 2 * math.log(1.0 / 6)
    val ham12 = math.log(1.0 / 3) + 2 * math.log(1.0 / 5)
    val (expCls, expScore) =
      if (spam12 > ham12) ("spam", spam12) else ("ham", ham12)
    assert(got(12L)._2 == expCls)
    assert(math.abs(got(12L)._3 - round6(expScore)) < 1e-9)
    m.release()
  }

  test("naive bayes separates classes with distinct vocabularies") {
    import spark.implicits._
    // deterministic synthetic corpus: 3 classes, each with its own core
    // vocabulary plus shared filler — the separable regime NB is for (the
    // driver testdata's lang column is a random label over ONE shared
    // vocabulary, so it is deliberately not separable and not used here)
    val core = Map(
      "news" -> Seq("election", "senate", "policy", "minister"),
      "code" -> Seq("compiler", "pointer", "stack", "syntax"),
      "bio" -> Seq("enzyme", "protein", "genome", "cell"))
    val filler = Seq("the", "and", "of", "with")
    val docs = (0 until 150).map { i =>
      val cls = Seq("news", "code", "bio")(i % 3)
      val words = (0 until 12).map { j =>
        if (j % 3 == 0) filler((i + j) % filler.size)
        else core(cls)((i * 7 + j) % 4)
      }
      (i.toLong, cls, words.mkString(" "))
    }.toDF("doc_id", "label", "text")
    val m = TextAnalysis.trainNaiveBayes(docs, "label", minCount = 2L)
    val pred = TextAnalysis.classifyNaiveBayes(docs, m)
      .join(docs.select("doc_id", "label"), Seq("doc_id"))
    val acc = pred.filter(col("pred_class") === col("label")).count()
      .toDouble / pred.count()
    assert(acc == 1.0,
      f"self-train accuracy $acc%.3f on disjoint-core vocabularies " +
        "— NB must separate these perfectly")
    m.release()
  }

  test("scoreBuckets labels exact rank terciles, ties broken by id") {
    import spark.implicits._
    // 9 rows, scores with ties: ranks 0..8, boundaries at 3 and 6
    val df = Seq((1L, 5), (2L, 5), (3L, 5), (4L, 1), (5L, 1),
      (6L, 9), (7L, 9), (8L, 0), (9L, 2)).toDF("id", "s")
    val got = CorpusOps.scoreBuckets(df, "s", "id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // sort by (s, id): 8(0) 4(1) 5(1) | 9(2) 1(5) 2(5) | 3(5) 6(9) 7(9)
    assert(got == Map(8L -> "head", 4L -> "head", 5L -> "head",
      9L -> "middle", 1L -> "middle", 2L -> "middle",
      3L -> "tail", 6L -> "tail", 7L -> "tail"))
  }

  test("scoreBuckets custom fractions and labels; input rows preserved") {
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "s")
    val got = CorpusOps.scoreBuckets(df, "s", "id",
      fracs = Seq(0.2), labels = Seq("keep", "drop"))
    assert(got.count() == 10)
    val m = got.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1L to 2L).forall(m(_) == "keep"))
    assert((3L to 10L).forall(m(_) == "drop"))
    intercept[IllegalArgumentException] {
      CorpusOps.scoreBuckets(df, "s", "id", fracs = Seq(0.5),
        labels = Seq("a", "b", "c"))
    }
  }
}
