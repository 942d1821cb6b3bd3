package graft

import graft.ops.{CorpusOps, Dedup, Profile, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Second round-5 operator batch: containment pairs, the Gopher rule
  * filter, dataset profiling, and weighted sampling without replacement.
  */
class Round5bOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round5b-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("ngramContainmentPairs: embedded doc scores 1.0 where jaccard dilutes") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 200).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, small),                    // fully contained in doc 2
      (2L, small + " " + filler),     // superset
      (3L, "iota kappa lambda mu nu xi omicron pi")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramContainmentPairs(docs, n = 3, threshold = 0.9)
      .collect()
    assert(pairs.length == 1)
    val row = pairs.head
    assert(row.getAs[Long]("id_a") == 1L && row.getAs[Long]("id_b") == 2L)
    assert(math.abs(row.getAs[Double]("containment") - 1.0) < 1e-12)
    // the directional view: all of A's grams are in B, few of B's in A
    assert(math.abs(row.getAs[Double]("in_a") - 1.0) < 1e-12)
    assert(row.getAs[Double]("in_b") < 0.1)
    // jaccard on the same pair is far below any near-dup threshold
    val j = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.0,
      minSharedShingles = 1).collect()
      .find(r => r.getAs[Long]("id_a") == 1L).get.getAs[Double]("jaccard")
    assert(j < 0.05, s"jaccard $j should dilute for the embedded pair")
  }

  test("gopherQualityFlags: hand-checked rule hits") {
    import spark.implicits._
    val good = ((1 to 60).map(i => s"word$i") ++
      Seq("the", "of", "and")).mkString(" ")
    val tooShort = "just a few little words here"
    val bullets = (1 to 50).map(i => s"- item$i the of").mkString("\n")
    val symbols = (1 to 60).map(i => s"w$i###").mkString(" ") + " the of"
    val docs = Seq((1L, good), (2L, tooShort), (3L, bullets),
      (4L, symbols)).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityFlags(docs)
      .select("doc_id", "keep", "ok_words", "ok_bullets", "ok_symbols",
        "ok_stops", "n_words")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"), "plain 63-word doc should pass")
    assert(!out(2L).getAs[Boolean]("ok_words") &&
      !out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("ok_bullets"),
      "every line bulleted must trip the 90% bullet rule")
    assert(!out(4L).getAs[Boolean]("ok_symbols"),
      "three #'s per word must trip the 0.1 symbol ratio")
  }

  test("profileColumns: exact counts, nulls, and string min/max") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (2L, "a"), (null, "a")
    ).toDF("k", "s")
    val p = Profile.profileColumns(df).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p("k").getAs[Long]("n_rows") == 4L)
    assert(p("k").getAs[Long]("n_nulls") == 1L)
    assert(p("k").getAs[Long]("n_distinct") == 2L)
    assert(p("k").getAs[String]("min_val") == "1" &&
      p("k").getAs[String]("max_val") == "2")
    assert(p("s").getAs[Long]("n_nulls") == 1L)
    assert(p("s").getAs[String]("min_val") == "a" &&
      p("s").getAs[String]("max_val") == "b")
    // approximate mode keeps the same shape
    val ap = Profile.profileColumns(df, exact = false).collect()
    assert(ap.length == 2 && ap.forall(_.getAs[Long]("n_distinct") > 0))
  }

  test("nearDupAgainstIndex: batch-vs-corpus matches equal full-LSH cross pairs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val corpus = Seq(
      (1L, base),
      (2L, "completely different text about spark catalyst optimizers " +
        "and distributed shuffle exchanges in query plans"),
      (3L, "third corpus document with its own unrelated content about " +
        "minhash banding and jaccard verification paths")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),                                  // exact dup of 1
      (11L, base.replace("lazy", "sleepy")),        // near dup of 1
      (12L, "a wholly novel batch document sharing nothing with the " +
        "corpus at all not even one shingle hopefully")
    ).toDF("doc_id", "text")
    val idx = Dedup.buildMinhashIndex(corpus)
    val got = Dedup.nearDupAgainstIndex(idx, batch, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((10L, 1L)), "exact dup must match its corpus twin")
    assert(got.contains((11L, 1L)), "near dup must match its corpus twin")
    assert(!got.exists(_._1 == 12L), "novel doc must not match")
    // equivalence: the same pairs the full corpus-wide LSH finds, restricted
    // to the (corpus x batch) axis
    val full = Dedup.minhashLsh(corpus.union(batch), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => p._1 <= 3 && p._2 >= 10)
      .map(p => (p._2, p._1)).toSet
    assert(got == full, s"index path $got != full-LSH cross pairs $full")
  }

  test("weightedSample: deterministic, capped, weight-dominant") {
    import spark.implicits._
    val rows = (1L to 200L).map { i =>
      // ids 1..10 get overwhelming weight: score u^(1/1e9) ~ 1, the rest
      // u^(1/1e-3) ~ 0 — the extreme-weight rows MUST win every draw
      (i, if (i <= 10) 1e9 else 1e-3)
    } :+ (201L, -5.0) // nonpositive weight: never sampled
    val df = rows.toDF("doc_id", "w")
    val s1 = CorpusOps.weightedSample(df, "w", n = 10, idCol = "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = CorpusOps.weightedSample(df, "w", n = 10, idCol = "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "md5-keyed sample must be reproducible")
    assert(s1 == (1L to 10L).toSet,
      s"extreme weights must dominate the sample, got $s1")
    // stratified: n per group, rank restarts, nonpositive excluded
    val strat = df.withColumn("g", (col("doc_id") % 2).cast("int"))
    val out = CorpusOps.weightedSample(strat, "w", n = 3,
      idCol = "doc_id", strataCols = Seq("g"))
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byG(0) == 3L && byG(1) == 3L)
    assert(out.agg(max("sample_rank")).head.getInt(0) == 3)
    assert(!out.select("doc_id").collect().map(_.getLong(0)).contains(201L))
  }

  test("unigramBitsPerToken: hand-computed smoothing, OOV count, ordering") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b"))
      .toDF("doc_id", "text")

    // minCount=1: counts a=3, b=3, c=1 -> total=7, V=3, denominator 11
    // p(a)=p(b)=4/11, p(c)=2/11; log2(11/4)=1.459432, log2(11/2)=2.459432
    val lm1 = TextAnalysis.buildUnigramLm(docs)
    val r1 = TextAnalysis.unigramBitsPerToken(docs, lm1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    assert(r1(1L)._1 == 3L && r1(1L)._2 == 0L)
    assert(math.abs(r1(1L)._3 - log2(11.0 / 4.0)) < 1e-6)
    assert(r1(3L)._3 == r1(1L)._3, "uniform-prob docs score identically")
    assert(math.abs(r1(2L)._3 -
      (log2(11.0 / 4.0) + log2(11.0 / 2.0)) / 2.0) < 1e-6)

    // minCount=2 drops c from the LM: total=6, V=2, denominator 9;
    // c becomes OOV (n_oov=1) scoring the unseen floor log2(9)
    val lm2 = TextAnalysis.buildUnigramLm(docs, minCount = 2L)
    val r2 = TextAnalysis.unigramBitsPerToken(docs, lm2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(r2(1L)._2 == 0L && r2(2L)._2 == 1L)
    assert(math.abs(r2(2L)._3 -
      (log2(9.0 / 4.0) + log2(9.0)) / 2.0) < 1e-6)
    // rare-word doc must score strictly worse (higher bits) than common
    assert(r2(2L)._3 > r2(1L)._3)
    // bound: every per-token surprisal is at most the unseen floor
    r2.values.foreach { case (_, _, bits) =>
      assert(bits > 0.0 && bits <= log2(9.0) + 1e-9)
    }
  }

  test("cutContaminatedSpans: leaked region excised whole, clean docs intact") {
    import spark.implicits._
    val leak = "SECRETBENCHMARKQUESTION" // 23 chars
    val eval = Seq((100L, leak)).toDF("doc_id", "text")
    val train = Seq(
      (1L, "AAAAABBBBB" + leak + "CCCCCDDDDD"), // full leak embedded
      (2L, "nothing to see here, perfectly clean document"),
      (3L, "xx" + leak.substring(0, 10) + "yy")  // exactly one leaked gram
    ).toDF("doc_id", "text")
    val out = Dedup.cutContaminatedSpans(train, eval, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_decontaminated"), r.getAs[Long]("n_spans_cut")))
      .toMap
    // all 14 contiguous leaked grams merge to ONE island covering exactly
    // the 23-char region; surrounding text survives
    assert(out(1L) == ("AAAAABBBBBCCCCCDDDDD", 1L))
    assert(out(2L) == ("nothing to see here, perfectly clean document", 0L))
    // a single matching gram cuts exactly its k chars
    assert(out(3L) == ("xxyy", 1L))
  }

  test("classifyLinear: hand-computed logit/sigmoid, OOV contributes zero") {
    import spark.implicits._
    val docs = Seq((1L, "aa bbb cccc"), (2L, "cccc cccc")).toDF("doc_id", "text")
    val w = Seq(("aa", 0.1), ("bbb", 0.2)).toDF("term", "weight")
    val out = TextAnalysis.classifyLinear(docs, w)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // doc 1: logit = (0.1 + 0.2 + 0)/3 = 0.1, sigmoid = 0.524979
    assert(out(1L)._1 == 3L && out(1L)._2 == 2L)
    assert(math.abs(out(1L)._3 - 0.1) < 1e-9)
    assert(math.abs(out(1L)._4 - 1.0 / (1.0 + math.exp(-0.1))) < 1e-6)
    // doc 2: all OOV -> logit = bias = 0, score exactly 0.5
    assert(out(2L)._2 == 0L && out(2L)._3 == 0.0 && out(2L)._4 == 0.5)
    // bias shifts the logit additively
    val biased = TextAnalysis.classifyLinear(docs, w, bias = -1.0)
      .filter(col("doc_id") === 1L).head()
    assert(math.abs(biased.getDouble(3) - (-0.9)) < 1e-9)
  }

  test("keepHeadByScore: exact cutoff, deterministic tie-break, rank dense") {
    import spark.implicits._
    // ten rows, scores 0.1..1.0 with a tie at 0.3 (ids 3 and 13)
    val df = ((1 to 10).map(i => (i.toLong, i / 10.0)) :+ (13L, 0.3))
      .toDF("doc_id", "score")
    val kept = CorpusOps.keepHeadByScore(df, "score", "doc_id", 0.5)
      .orderBy("rank").collect()
    // 11 rows, keep rank < 5.5 -> 6 rows; tie at 0.3 orders id 3 before 13
    assert(kept.length == 6)
    assert(kept.map(_.getAs[Long]("doc_id")).toSeq ==
      Seq(1L, 2L, 3L, 13L, 4L, 5L))
    assert(kept.map(_.getAs[Long]("rank")).toSeq == (0L to 5L))
    // keepFrac = 1.0 keeps everything, ranks stay dense 0..n-1
    val all = CorpusOps.keepHeadByScore(df, "score", "doc_id", 1.0)
    assert(all.count() == 11L)
    assert(all.agg(max("rank")).head.getLong(0) == 10L)
    // reruns are identical (sort + zipWithIndex is deterministic)
    val rerun = CorpusOps.keepHeadByScore(df, "score", "doc_id", 0.5)
      .orderBy("rank").collect()
    assert(rerun.map(_.toSeq).toSeq == kept.map(_.toSeq).toSeq)
  }
}
