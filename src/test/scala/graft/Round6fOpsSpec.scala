package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 8: DP group counts, personalized PageRank, WordPiece
  * encoding.
  */
class Round6fOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round6f-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("dpGroupCounts: deterministic across runs, noise actually " +
      "perturbs, seed changes the draw, null group distinct from ''") {
    import spark.implicits._
    val df = (1L to 300L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else null))
      .toDF("id", "grp")
    val a = graft.ops.Profile.dpGroupCounts(df, Seq("grp"), 0.5)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    val b = graft.ops.Profile.dpGroupCounts(df, Seq("grp"), 0.5)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(a == b)                      // replay-deterministic
    assert(a.size == 3 && a.contains(None))
    assert(a.values.forall(v => (v - 100.0).abs > 1e-9)) // noise != 0
    val other = graft.ops.Profile.dpGroupCounts(df, Seq("grp"), 0.5,
      seed = "dp2").collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(other != a)                  // seed changes the draw
    // noise magnitude sane for eps=0.5 (b=2): P(|x|>40) ~ 2e-9
    assert(a.values.forall(v => (v - 100.0).abs < 40.0))
  }

  test("pageRankPersonalized: closed-form 2-path; zero rank outside " +
      "the sources' component") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("c", "d")).toDF("src", "dst")
    val out = graft.graph.GraphOps.pageRankPersonalized(
      edges, Seq("a").toDF("v"), tol = 0.0, maxIter = 80)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // fixpoint: a = 0.15 + 0.85 b, b = 0.85 a -> a = 0.540541,
    // b = 0.459459; c,d hold exactly 0 (no teleport, no inflow)
    assert(math.abs(out("a") - 0.540541) < 1e-4, out.toString)
    assert(math.abs(out("b") - 0.459459) < 1e-4, out.toString)
    assert(out("c") == 0.0 && out("d") == 0.0, out.toString)
  }

  test("pageRankPersonalized: an edge-less topic vertex keeps its " +
      "0.15 teleport mass instead of vanishing") {
    import spark.implicits._
    val edges = Seq(("c", "d")).toDF("src", "dst")
    val out = graft.graph.GraphOps.pageRankPersonalized(
      edges, Seq("a").toDF("v"), tol = 0.0, maxIter = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 0.15, out.toString)
    assert(out("c") == 0.0 && out("d") == 0.0)
  }

  test("wordPieceVocab: supplementary-plane chars stay whole code " +
      "points, never lone surrogate halves") {
    import spark.implicits._
    val docs = Seq((1L, "ab 😀cd")).toDF("doc_id", "text")
    val vocab = graft.ops.Tokenize.wordPieceVocab(docs, topWords = 0)
    assert(vocab.contains("😀") &&
      vocab.contains("##😀"))
    // a lone surrogate half decodes as a code point in D800-DFFF
    assert(vocab.forall(v => !v.codePoints().toArray
      .exists(cp => cp >= 0xD800 && cp <= 0xDFFF)))
    // and the encode round-trips the emoji word without UNK
    val out = graft.ops.Tokenize.encodeWordPiece(docs, vocab)
      .collect().head.getSeq[String](1)
    assert(!out.contains("[UNK]"))
    assert(out.contains("😀") || out.exists(_.contains("😀")))
  }

  test("wordPieceWord: BERT goldens — longest-match-first, ## " +
      "continuations, all-or-nothing UNK, maxWordLen") {
    import graft.ops.Tokenize.wordPieceWord
    val vocab = Set("un", "##aff", "##able", "a", "##a", "ab",
      "##b", "b")
    assert(wordPieceWord("unaffable", vocab, "[UNK]", 64).toSeq ==
      Seq("un", "##aff", "##able"))
    // longest-first: "ab" beats "a"+"##b"
    assert(wordPieceWord("ab", vocab, "[UNK]", 64).toSeq == Seq("ab"))
    assert(wordPieceWord("aba", vocab, "[UNK]", 64).toSeq ==
      Seq("ab", "##a"))
    // 'z' unmatchable -> whole word UNK even though "a" matches
    assert(wordPieceWord("az", vocab, "[UNK]", 64).toSeq == Seq("[UNK]"))
    assert(wordPieceWord("ab", vocab, "[UNK]", 1).toSeq == Seq("[UNK]"))
  }

  test("encodeWordPiece + wordPieceVocab: round-trips the corpus with " +
      "zero UNKs (vocab covers all chars) and whole words stay whole") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat"), (2L, "the the the"))
      .toDF("doc_id", "text")
    val vocab = graft.ops.Tokenize.wordPieceVocab(docs, topWords = 1)
    // top word 'the' is whole; all chars present in both forms
    val out = graft.ops.Tokenize.encodeWordPiece(docs, vocab)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toList).toMap
    assert(out(2L) == List("the", "the", "the"))
    assert(!out(1L).contains("[UNK]"))
    assert(out(1L).take(1) == List("the"))
    // non-top words decompose into char pieces with ## continuations
    assert(out(1L).count(_.startsWith("##")) > 0)
  }
}
