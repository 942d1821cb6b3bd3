package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 5: confusion matrix, Cohen's kappa, MERGE INTO,
  * expectation suite, label propagation, tf-idf cosine pairs.
  */
class Round6cOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round6c-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.ops.{Cdc, CorpusOps, Profile}

  test("confusionMatrix: counts cells, keeps null label/pred cells") {
    import spark.implicits._
    val scored = Seq(
      ("en", "en"), ("en", "en"), ("en", "de"),
      ("de", "en"), (null: String, "en"), ("de", null: String)
    ).toDF("lab", "prd")
    val out = CorpusOps.confusionMatrix(scored, "lab", "prd")
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2)))
      .toSet
    assert(out == Set(
      (Some("en"), Some("en"), 2L), (Some("en"), Some("de"), 1L),
      (Some("de"), Some("en"), 1L), (None, Some("en"), 1L),
      (Some("de"), None, 1L)))
  }

  test("cohenKappa: hand-computed sources; null ratings drop; " +
      "null-vs-null never agrees") {
    import spark.implicits._
    // 6 rated both sides: agree on 4; marginals a: {x:4, y:2},
    // b: {x:4, y:1, z:1} -> pe = 4*4 + 2*1 = 18 (z only rated by b: 0)
    val rated = Seq(
      ("x", "x"), ("x", "x"), ("x", "x"), ("y", "y"),
      ("x", "z"), ("y", "x"),
      (null: String, null: String), ("x", null: String),
      (null: String, "y")
    ).toDF("a", "b")
    val r = CorpusOps.cohenKappa(rated, "a", "b").collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
      == ((6L, 4L, 18L)))
    // kappa = (4*6 - 18) / (36 - 18) = 6/18 = 1/3 downstream
  }

  test("mergeInto: update replaces, insert appends, delete drops, " +
      "untouched target passes through") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val source = Seq((2L, "B"), (4L, "d"), (3L, "dead"), (9L, "dead"))
      .toDF("id", "v")
    val out = Cdc.mergeInto(target, source, Seq("id"),
      isDelete = col("v") === "dead")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 untouched, 2 updated, 3 deleted, 4 inserted, 9 delete-no-match
    assert(out == Map(1L -> "a", 2L -> "B", 4L -> "d"))
  }

  test("mergeInto: NULL delete predicate means not-delete (the row " +
      "updates instead of silently vanishing)") {
    import spark.implicits._
    val target = Seq((1L, "a", "ok")).toDF("id", "v", "status")
    val source = Seq((1L, "A", null: String), (2L, "b", "dead"))
      .toDF("id", "v", "status")
    val out = Cdc.mergeInto(target, source, Seq("id"),
      isDelete = col("status") === "dead")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "A")) // updated, NOT lost; 2 deleted
  }

  test("cohenKappa: zero rated-both rows yields clean integer zeros") {
    import spark.implicits._
    val rated = Seq(("x", null: String), (null: String, "y"))
      .toDF("a", "b")
    val r = CorpusOps.cohenKappa(rated, "a", "b").collect()
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
      == ((0L, 0L, 0L)))
  }

  test("tfidfCosinePairs: a null-id doc neither pairs nor inflates df") {
    import spark.implicits._
    val docs = Seq(
      (Option(1L), "alpha beta gamma delta"),
      (Option(2L), "alpha beta gamma epsilon"),
      (Option.empty[Long], "alpha beta gamma zeta")
    ).toDF("doc_id", "text")
    val withNull = graft.ops.TextAnalysis
      .tfidfCosinePairs(docs, threshold = 0.01, maxDocFreq = 10, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val without = graft.ops.TextAnalysis
      .tfidfCosinePairs(docs.filter(col("doc_id").isNotNull),
        threshold = 0.01, maxDocFreq = 10, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(withNull.toSeq == without.toSeq) // identical df, idf, cosine
  }

  test("mergeInto: rejects schema mismatch") {
    import spark.implicits._
    val t = Seq((1L, "a")).toDF("id", "v")
    val s = Seq((1L, "a")).toDF("v", "id")
    intercept[IllegalArgumentException] {
      Cdc.mergeInto(t, s, Seq("id"))
    }
  }

  test("checkExpectations: every check type, exact violation counts") {
    import spark.implicits._
    import Profile.Expectation._
    val df = Seq(
      (1L, "en", 10.0, "src1"),
      (2L, "de", Double.NaN, "src2"),          // NaN violates in_range
      (3L, null: String, -1.0, "srcX"),        // null lang; -1 below lo
      (3L, "zz", 5.0, "bad src"),              // dup id; zz not in set/dim
      (4L, "en", 11.0, "src3")                 // 11 above hi
    ).toDF("id", "lang", "score", "src")
    val dim = Seq("en", "de").toDF("lang")
    val out = Profile.checkExpectations(df, Seq(
      NotNull("lang"),
      InRange("score", 0, 10),
      MatchesRegex("src", "^src\\d+$"),
      InSet("lang", Seq("en", "de")),
      Unique(Seq("id")),
      RefersTo("lang", dim, "lang")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map(
      "not_null(lang)" -> ((5L, 1L)),
      "in_range(score)" -> ((5L, 3L)), // NaN, -1, 11
      "matches_regex(src)" -> ((5L, 2L)), // srcX, "bad src"
      "in_set(lang)" -> ((5L, 1L)), // zz (null doesn't count)
      "unique(id)" -> ((5L, 2L)), // both id=3 rows
      "refers_to(lang)" -> ((5L, 1L)))) // zz
  }

  test("checkExpectations: rejects empty suite and duplicate names") {
    import spark.implicits._
    import Profile.Expectation._
    val df = Seq((1L, "x")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Profile.checkExpectations(df, Nil)
    }
    intercept[IllegalArgumentException] {
      Profile.checkExpectations(df,
        Seq(InRange("id", 0, 1), InRange("id", 0, 100)))
    }
  }

  test("labelPropagation: two planted cliques joined by one bridge " +
      "resolve to two communities labeled by their min vertex") {
    import spark.implicits._
    def clique(vs: Seq[Long]): Seq[(Long, Long)] =
      for (a <- vs; b <- vs if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L)))
      .toDF("src", "dst")
    val out = graft.graph.GraphOps.labelPropagation(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(v => out(v) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(v => out(v) == 10L))
  }

  test("labelPropagation: deterministic across reruns; drops " +
      "self-loops/nulls; symmetric regardless of edge direction") {
    import spark.implicits._
    val edges = Seq(
      (Some(2L), Some(1L)), (Some(3L), Some(1L)), (Some(2L), Some(3L)),
      (Some(5L), Some(5L)), (Some(7L), Some(2L)), (None, Some(1L))
    ).toDF("src", "dst")
    val a = graft.graph.GraphOps.labelPropagation(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val b = graft.graph.GraphOps.labelPropagation(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(a == b)
    assert(!a.exists(_._1 == 5L)) // self-loop-only vertex absent
    assert(a.map(_._1) == Set(1L, 2L, 3L, 7L))
  }

  test("tfidfCosinePairs: near-identical docs pair high; disjoint " +
      "docs never pair; trigram mode matches a hand-computed cosine") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .tfidfCosinePairs(docs, threshold = 0.1, maxDocFreq = 10, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out.keySet == Set((1L, 2L)))
    // docs 1,2 share trigrams "alpha beta gamma", "beta gamma delta",
    // "gamma delta epsilon" (df=2, idf=ln(3/2)); each doc has 1 unique
    // trigram (df=1, idf=ln 3). tf=1 everywhere ->
    // cos = 3*ln(3/2)^2 / (3*ln(3/2)^2 + ln(3)^2) on the 6-dp lattice
    val s = math.pow(BigDecimal(math.log(3.0 / 2)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 2)
    val u = math.pow(BigDecimal(math.log(3.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 2)
    val expected = BigDecimal(3 * s / (3 * s + u)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out((1L, 2L)) - expected) < 1e-9)
  }

  test("tfidfCosinePairs: df cap suppresses pairs whose only overlap " +
      "is corpus-hot terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common x1"), (2L, "common x2"), (3L, "common x3"),
      (4L, "common x4")
    ).toDF("doc_id", "text")
    // unigram mode: 'common' has df=4 > cap=3 -> no candidates at all
    val out = graft.ops.TextAnalysis
      .tfidfCosinePairs(docs, threshold = 0.01, maxDocFreq = 3, n = 1)
    assert(out.isEmpty)
  }
}
