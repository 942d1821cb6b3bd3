package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BM25 retrieval: hand-computed scores, ranking semantics, and the
  * inverted-index pruning shape.
  */
class Bm25Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("bm25-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def round6(x: Double) = math.round(x * 1e6) / 1e6

  test("bm25TopK matches a hand-computed Okapi/Lucene score") {
    import spark.implicits._
    // corpus: N = 3 (all docs tokenized), dl = 4, 2, 2, avgdl = 8/3
    val docs = Seq(
      (1L, "spark spark shuffle join"),
      (2L, "spark catalyst"),
      (3L, "duckdb oracle")
    ).toDF("doc_id", "text")
    val qs = Seq((100L, "spark")).toDF("query_id", "text")
    val got = TextAnalysis.bm25TopK(docs, qs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getInt(3))))
      .toMap

    val n = 3.0; val df = 2.0; val avgdl = 8.0 / 3.0
    val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    // doc 1: tf=2, dl=4; doc 2: tf=1, dl=2; doc 3 has no query term
    val s1 = round6(w(2, 4)); val s2 = round6(w(1, 2))
    assert(got.keySet == Set((100L, 1L), (100L, 2L)))
    assert(got((100L, 1L))._1 == s1 && got((100L, 2L))._1 == s2)
    // tf=2 at dl=4 still outranks tf=1 at dl=2 under these params
    assert(s1 > s2 && got((100L, 1L))._2 == 1 && got((100L, 2L))._2 == 2)
  }

  test("query term multiplicity is ignored; empty-token docs excluded from stats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha gamma"),
      (3L, "   ") // tokenizes to nothing: out of N and avgdl
    ).toDF("doc_id", "text")
    val q1 = Seq((9L, "alpha")).toDF("query_id", "text")
    val q2 = Seq((9L, "alpha alpha alpha")).toDF("query_id", "text")
    val r1 = TextAnalysis.bm25TopK(docs, q1).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSet
    val r2 = TextAnalysis.bm25TopK(docs, q2).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(r1 == r2 && r1.map(_._1) == Set(1L, 2L))
    // N = 2 (doc 3 never tokenizes), df = 2, tf = 1, dl = avgdl = 2
    val expected = round6(math.log(1 + 0.5 / 2.5) * 2.2 / (1 + 1.2))
    assert(r1.forall(_._2 == expected))
  }

  test("k truncates per query; ranking breaks score ties by doc id") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, "common token")).toDF("doc_id", "text")
    val qs = Seq((1L, "common")).toDF("query_id", "text")
    val got = TextAnalysis.bm25TopK(docs, qs, k = 5).collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    // identical docs → identical scores → ranks follow doc id
    assert(got.sortBy(_._2).map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("flagBlocklisted: case-insensitive word hits, distinct-term counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Spam and MORE spam here"),
      (2L, "clean document entirely"),
      (3L, "spam scam spam scam")
    ).toDF("doc_id", "text")
    val bl = Seq("SPAM", "scam", "absent").toDF("term")
    val got = graft.ops.CorpusOps.flagBlocklisted(docs, bl).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((2L, 1L)), 3L -> ((4L, 2L))))
    // flagged-doc anti-join leaves the clean doc
    val clean = docs.join(graft.ops.CorpusOps.flagBlocklisted(docs, bl)
      .select("doc_id"), Seq("doc_id"), "left_anti")
    assert(clean.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("bm25Probe against a prebuilt index equals the one-shot bm25TopK") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark shuffle join"),
      (2L, "spark catalyst"),
      (3L, "duckdb oracle shuffle")
    ).toDF("doc_id", "text")
    val qs = Seq((100L, "spark shuffle"), (101L, "oracle")).toDF("query_id", "text")
    val oneShot = TextAnalysis.bm25TopK(docs, qs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val ix = TextAnalysis.buildPostingsIndex(docs)
    try {
      val probed = TextAnalysis.bm25Probe(ix, qs, k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(probed == oneShot && probed.nonEmpty)
    } finally ix.release()
  }

  test("corpusReport: integer-only data card with hand-checked totals") {
    import spark.implicits._
    val docs = Seq(
      ("web", "en", 1L, "one two three"),
      ("web", "en", 2L, "four five"),
      ("web", "de", 3L, "contact me@example.com now"),
      ("books", "en", 4L, "number 1234567890 is long")
    ).toDF("source", "lang", "doc_id", "text")
    val got = graft.ops.CorpusOps.corpusReport(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8)))).toMap
    // (n_docs, n_tokens, min_tokens, max_tokens, n_email_docs, n_longnum_docs)
    assert(got(("web", "en")) == ((2L, 5L, 2L, 3L, 0L, 0L)))
    assert(got(("web", "de")) == ((1L, 3L, 3L, 3L, 1L, 0L)))
    assert(got(("books", "en")) == ((1L, 4L, 4L, 4L, 0L, 1L)))
  }

  test("flagBlocklistedPhrases: substring containment, distinct + first hit") {
    import spark.implicits._
    val docs = Seq(
      (1L, "we visited the Grand Casino Royale yesterday"),
      (2L, "a perfectly clean document"),
      (3L, "casino royale and casino night and lottery tickets")
    ).toDF("doc_id", "text")
    val phrases = Seq("Casino Royale", "lottery", "absent phrase").toDF("phrase")
    val got = graft.ops.CorpusOps.flagBlocklistedPhrases(docs, phrases)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    // substring + case-insensitive; doc 3 hits two distinct phrases and
    // reports the alphabetically first
    assert(got == Map(1L -> ((1L, "casino royale")),
      3L -> ((2L, "casino royale"))))
  }

  test("postings are pruned to query terms before the wide stages") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val qs = Seq((9L, "b")).toDF("query_id", "text")
    val plan = TextAnalysis.bm25TopK(docs, qs)
      .queryExecution.executedPlan.toString
    // the query-term prune must ride a broadcast join, and no stage may
    // fall back to an unblocked product
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
