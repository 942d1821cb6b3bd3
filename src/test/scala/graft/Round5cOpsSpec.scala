package graft

import graft.ops.{CorpusOps, Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Third round-5 operator batch: bigram Stupid Backoff LM scoring. */
class Round5cOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round5c-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("buildBigramLm counts unigrams and adjacent pairs") {
    import spark.implicits._
    val ref = Seq((1L, "a b a b"), (2L, "a b b")).toDF("doc_id", "text")
    val lm = TextAnalysis.buildBigramLm(ref)
    val uni = lm.unigrams.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 3L, "b" -> 4L))
    val big = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "b") -> 1L))
  }

  test("stupidBackoffBits: hand-computed bigram hit, backoff, first token") {
    import spark.implicits._
    val ref = Seq((1L, "a b a b"), (2L, "a b b")).toDF("doc_id", "text")
    val lm = TextAnalysis.buildBigramLm(ref)
    val docs = Seq((10L, "a b c"), (11L, "b b"), (12L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoffBits(docs, lm).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    def log2(x: Double) = math.log(x) / 0.6931471805599453
    def round6(x: Double) = math.round(x * 1e6) / 1e6

    // doc 10: "a" first-token smoothed unigram (3+1)/(7+2+1)=0.4;
    // "b"|"a" bigram 3/3=1.0; "c"|"b" unseen -> 0.4*(0+1)/10=0.04
    val exp10 = round6((-log2(0.4) - log2(1.0) - log2(0.04)) / 3)
    assert(got(10L)._1 == 3 && got(10L)._2 == 1)
    assert(math.abs(got(10L)._3 - exp10) < 1e-9)
    assert(math.abs(got(10L)._3 - 1.988595) < 1e-6)

    // doc 11: "b" first (4+1)/10=0.5; "b"|"b" bigram 1/4=0.25
    assert(got(11L) == ((2L, 1L, round6((-log2(0.5) - log2(0.25)) / 2))))
    assert(math.abs(got(11L)._3 - 1.5) < 1e-6)

    // empty docs produce no token rows at all
    assert(!got.contains(12L))
  }

  test("stripBoilerplate cuts per-source hot lines everywhere, no owner") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A", "NAV\nalpha\nNAV"),    // NAV twice in one doc = 1 distinct doc
      (2L, "A", "NAV\nbeta"),
      (3L, "A", "NAV\ngamma"),
      (4L, "B", "NAV\ndelta"),         // NAV in B appears in only 1 doc
      (5L, "A", "epsilon")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.stripBoilerplate(docs, minDocs = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_deduped"), r.getAs[Long]("n_lines_cut"))))
      .toMap
    // NAV seen in 3 distinct docs of source A -> cut from ALL A docs
    // (both copies in doc 1), untouched in source B
    assert(got(1L) == (("alpha", 2L)))
    assert(got(2L) == (("beta", 1L)))
    assert(got(3L) == (("gamma", 1L)))
    assert(got(4L) == (("NAV\ndelta", 0L)))
    assert(got(5L) == (("epsilon", 0L)))
  }

  test("piiReport counts per class; digits inside emails count once") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a@b.co and c.d@e-f.org plus 1234567890 end"),
      (2L, "digits12345678901inside x9876543210@long.example.com"),
      (3L, "clean text only"),
      (4L, "short 12345678 run") // 8 digits: below the 9+ threshold
    ).toDF("doc_id", "text")
    val got = CorpusOps.piiReport(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((2, 1, true)))
    // doc 2: the email's digits are scrubbed to <EMAIL> first, so only the
    // standalone 11-digit run counts
    assert(got(2L) == ((1, 1, true)))
    assert(got(3L) == ((0, 0, false)))
    assert(got(4L) == ((0, 0, false)))
  }

  test("minCount prunes bigrams but backoff still scores them") {
    import spark.implicits._
    val ref = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    // bigram (x,y):2 survives minCount=2; (y,x):1 and (y,z):1 do not
    val lm = TextAnalysis.buildBigramLm(ref, minCount = 2)
    assert(lm.bigrams.collect().map(r => (r.getString(0), r.getString(1)))
      .toSet == Set(("x", "y")))
    // unigrams: x:2, y:2 survive; z:1 pruned -> OOV smoothing path
    val scored = TextAnalysis.stupidBackoffBits(
      Seq((1L, "x y z")).toDF("doc_id", "text"), lm).collect().head
    assert(scored.getLong(1) == 3)      // all tokens scored
    assert(scored.getLong(2) == 1)      // one bigram hit: (x,y)
    assert(scored.getDouble(3) > 0)     // finite — no -inf from pruned rows
  }

  test("buildTrigramLm one-pass tables match direct counts") {
    import spark.implicits._
    val ref = Seq((1L, "a b c a b c"), (2L, "a b a")).toDF("doc_id", "text")
    val lm = TextAnalysis.buildTrigramLm(ref, minCount = 2)
    val uni = lm.unigrams.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 4L, "b" -> 3L, "c" -> 2L))
    val big = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big == Map(("a", "b") -> 3L, ("b", "c") -> 2L))
    val tri = lm.trigrams.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(tri == Map(("a", "b", "c") -> 2L))
  }

  test("stupidBackoff3Bits: trigram hit, double backoff, OOV start") {
    import spark.implicits._
    val ref = Seq((1L, "a b c a b c"), (2L, "a b a")).toDF("doc_id", "text")
    val lm = TextAnalysis.buildTrigramLm(ref, minCount = 2)
    val docs = Seq((10L, "a b c"), (11L, "b c a"), (12L, "x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoff3Bits(docs, lm).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    def log2(x: Double) = math.log(x) / 0.6931471805599453
    def round6(x: Double) = math.round(x * 1e6) / 1e6

    // tot=9 v=3 -> base(t) = (n1+1)/13
    // doc 10: a -> 5/13; b|a bigram 3/4; c|(a,b) trigram 2/n_ctx(a,b)=2/3
    val exp10 = round6(
      (-log2(5.0 / 13) - log2(3.0 / 4) - log2(2.0 / 3)) / 3)
    assert(got(10L)._1 == 3 && got(10L)._2 == 1)
    assert(math.abs(got(10L)._3 - exp10) < 1e-9)

    // doc 11: b -> 4/13; c|b bigram 2/3; a|(b,c): trigram pruned AND
    // bigram (c,a) pruned -> alpha^2 * base(a) = 0.16 * 5/13
    val exp11 = round6(
      (-log2(4.0 / 13) - log2(2.0 / 3) - log2(0.16 * 5.0 / 13)) / 3)
    assert(got(11L)._1 == 3 && got(11L)._2 == 0)
    assert(math.abs(got(11L)._3 - exp11) < 1e-9)

    // doc 12: OOV first token -> smoothed 1/13
    assert(got(12L) == ((1L, 0L, round6(-log2(1.0 / 13)))))
  }
}
