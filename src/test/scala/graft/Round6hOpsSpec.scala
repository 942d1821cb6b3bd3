package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 10: soft dedup, Aho–Corasick blocklist kernel,
  * hard-negative mining, KMV overlap estimation.
  */
class Round6hOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round6h-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // --- softKeep ----------------------------------------------------------

  test("softKeep: unique docs always kept; dup groups keep ~1 expected; " +
      "null text shares one sentinel group") {
    import spark.implicits._
    val docs = ((1L to 40L).map(i => (i, s"unique doc $i")) ++
      (41L to 104L).map(i => (i, "same dup text")) ++
      Seq((105L, null.asInstanceOf[String]), (106L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.softKeep(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq
    // uniques: n = 1 -> bucket16 * 1 < 65536 always
    assert(out.filter(_._1 <= 40).forall(t => t._2 == 1L && t._3))
    // the 64-dup group: each member kept w.p. 1/64; E[survivors] = 1,
    // P(>=7 survive) < 1e-4 — assert the count is plausible, and
    // deterministic (re-run must agree exactly)
    val dupKept = out.filter(t => t._1 >= 41 && t._1 <= 104)
    assert(dupKept.forall(_._2 == 64L))
    // deterministic lattice: exactly doc 63 survives this group
    // (hash60(md5("63")) is the one value < 2^60/64 among ids 41..104)
    assert(dupKept.filter(_._3).map(_._1).toSeq == Seq(63L))
    // null texts form ONE group of 2 (not dropped, not singletons);
    // lattice keeps 105, drops 106
    assert(out.filter(_._1 >= 105).forall(_._2 == 2L))
    assert(out.filter(_._1 >= 105).filter(_._3).map(_._1).toSeq ==
      Seq(105L))
  }

  test("softKeep: no 16-bit saturation — a 70000-dup group still keeps " +
      "~1 (expected) survivor, and kept is never NULL") {
    import spark.implicits._
    val docs = (0L until 70000L).map(i => (i, "same"))
      .toDF("doc_id", "text")
    val kept = graft.ops.Dedup.softKeep(docs)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0))
    // 60-bit lattice: exactly id 5329 lands under 2^60/70000 (a 16-bit
    // bucket would saturate at 1/65536 and keep ~15 expected members)
    assert(kept.toSeq == Seq(5329L))
    // null id: sentinel-hashed, never a NULL kept flag
    val nid = graft.ops.Dedup.softKeep(
        Seq((Option.empty[Long], "x")).toDF("doc_id", "text"))
      .select("kept").collect().head
    assert(!nid.isNullAt(0) && nid.getBoolean(0)) // n = 1 always survives
  }

  // --- AhoCorasick -------------------------------------------------------

  test("AhoCorasick: matches == contains brute force, incl. overlapping, " +
      "nested, and empty patterns") {
    val pats = Array("", "a", "aa", "aba", "bab", "xyz", "yz", "z",
      "hash join", "hash").sorted
    val ac = new graft.functions.AhoCorasick(pats)
    val texts = Seq("", "a", "aa", "aaa", "ababab", "the hash join plan",
      "xxyzz", "bbb", "hash", "zzz aba bab")
    for (t <- texts) {
      val got = ac.matchedSorted(t).toArray[AnyRef](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val want = pats.filter(t.contains(_)).toSeq // "" always contained
      assert(got == want, s"text='$t': got $got want $want")
    }
  }

  test("AhoCorasick: randomized equivalence with contains over a small " +
      "alphabet (dense overlap regime)") {
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar)
      .mkString
    val pats = (1 to 30).map(_ => randStr(1 + rnd.nextInt(4)))
      .distinct.sorted.toArray
    val ac = new graft.functions.AhoCorasick(pats)
    for (_ <- 1 to 200) {
      val t = randStr(rnd.nextInt(40))
      val got = ac.matchedSorted(t).toArray[AnyRef](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got == pats.filter(t.contains(_)).toSeq, s"text='$t'")
    }
  }

  test("flagBlocklistedPhrasesAC == flagBlocklistedPhrases on a generated " +
      "list; maxPhrases guard fires") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Alpha beta GAMMA delta"), (2L, "no hits here at all"),
      (3L, "beta beta beta"), (4L, null.asInstanceOf[String]),
      (5L, "gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val phrases = (Seq("alpha beta", "BETA", "gamma delta", "zeta",
      "absent phrase") ++ (1 to 300).map(i => s"filler$i"))
      .toDF("phrase")
    val theta = graft.ops.CorpusOps
      .flagBlocklistedPhrases(docs, phrases).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val ac = graft.ops.CorpusOps
      .flagBlocklistedPhrasesAC(docs, phrases).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(ac.toSeq == theta.toSeq)
    assert(ac.map(_._1).toSeq == Seq(1L, 3L, 5L))
    intercept[IllegalArgumentException] {
      graft.ops.CorpusOps.flagBlocklistedPhrasesAC(docs, phrases,
        maxPhrases = 10)
    }
    // duplicate ids (pre-dedup crawl): both variants aggregate per id
    val dup = Seq((7L, "alpha beta x"), (7L, "gamma delta y"))
      .toDF("doc_id", "text")
    val small = Seq("alpha beta", "gamma delta").toDF("phrase")
    val t7 = graft.ops.CorpusOps.flagBlocklistedPhrases(dup, small)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val a7 = graft.ops.CorpusOps.flagBlocklistedPhrasesAC(dup, small)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(t7.toSeq == Seq((7L, 2L, "alpha beta")) && a7.toSeq == t7.toSeq)
  }

  // --- hardNegatives -----------------------------------------------------

  test("hardNegatives: planted geometry — nearest same-label neighbor is " +
      "skipped, different-label ones rank; null labels excluded; " +
      "hardNegativesFrom agrees given exhaustive candidates") {
    import spark.implicits._
    // axis-aligned clusters: label 0 near x-axis, label 1 near y-axis;
    // vec 100 (label 0) is closest to the query but must NOT appear
    val corpus = Seq(
      (100L, Seq(1.0f, 0.01f), Some(0)),
      (101L, Seq(1.0f, 0.2f), Some(1)),
      (102L, Seq(1.0f, 0.4f), Some(1)),
      (103L, Seq(0.0f, 1.0f), Some(1)),
      (104L, Seq(1.0f, 0.3f), None))
      .toDF("vec_id", "embedding", "label")
    val qs = Seq((1L, Seq(1.0f, 0.0f), Some(0)))
      .toDF("query_id", "embedding", "label")
    val got = graft.ops.Similarity.hardNegatives(qs, corpus, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2)
    // closest different-label: 101 (smallest angle), then 102; 100 is
    // same-label, 104 null-label — both excluded
    assert(got.toSeq == Seq((101L, 1), (102L, 2)))
    val cands = graft.ops.Similarity.bruteForceTopK(
      qs.select("query_id", "embedding"), corpus, k = 10)
    val viaFrom = graft.ops.Similarity.hardNegativesFrom(
        cands, qs, corpus, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2)
    assert(viaFrom.toSeq == got.toSeq)
  }

  // --- nameSimilarityUpper -------------------------------------------------

  test("nameSimilarityUpper: proven upper bound on scoreNameSimilarity " +
      "over randomized inputs (incl. the word-reversed retry regime)") {
    val rnd = new scala.util.Random(7)
    def word = (1 to 1 + rnd.nextInt(6))
      .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    for (_ <- 1 to 500) {
      val a = (1 to 1 + rnd.nextInt(4)).map(_ => word).mkString(" ")
      val b = if (rnd.nextBoolean()) a.split(" ").reverse.mkString(" ")
              else (1 to 1 + rnd.nextInt(4)).map(_ => word).mkString(" ")
      val exact = graft.functions.TextKernels.scoreNameSimilarity(a, b)
      val upper = graft.functions.TextKernels.nameSimilarityUpper(a, b)
      assert(upper >= exact - 1e-12, s"a='$a' b='$b': $upper < $exact")
    }
    // and the empty/whitespace edge both kernels special-case
    assert(graft.functions.TextKernels.nameSimilarityUpper("  ", "") == 1.0)
  }

  test("blockedFuzzyJoin: prefilter changes nothing — same pairs as the " +
      "unfiltered exact predicate") {
    import spark.implicits._
    val lhs = Seq((1L, "k", "alpha beta gamma"), (2L, "k", "delta epsilon"),
      (3L, "k", "zeta eta theta"))
      .toDF("l_id", "l_key", "l_name")
    val rhs = Seq((11L, "k", "alpha beta gamm"), (12L, "k", "wholly other"),
      (13L, "k", "eta zeta theta"))
      .toDF("r_id", "r_key", "r_name")
    val got = graft.ops.Joins.blockedFuzzyJoin(lhs, rhs,
        Seq("l_key" -> "r_key"), "l_name", "r_name", threshold = 0.8)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq
    val want = lhs.crossJoin(rhs).collect().map { r =>
      val s = graft.functions.TextKernels.scoreNameSimilarity(
        r.getString(2), r.getString(5))
      ((r.getLong(0), r.getLong(3)),
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble >= 0.8)
    }.filter(_._2).map(_._1).sortBy(identity).toSeq
    assert(got == want && got.nonEmpty, s"got $got want $want")
  }

  // --- overlapEstimate ---------------------------------------------------

  test("overlapEstimate: exact regime (k >= union) reports true set " +
      "sizes; estimate regime lands near truth; empty inputs safe") {
    import spark.implicits._
    val a = (1 to 300).map(i => s"key$i").toDF("k")
    val b = (201 to 500).map(i => s"key$i").toDF("k")
    // exact regime: k = 1000 > 500 distinct union keys
    val ex = graft.ops.Sketches.overlapEstimate(a, b, "k", k = 1000)
      .collect().head
    assert((ex.getLong(0), ex.getLong(1), ex.getLong(2), ex.getLong(3)) ==
      ((500L, 100L, 300L, 300L)))
    // estimate regime: k = 64; union estimate (k-1)*2^60/kth within 40%,
    // intersection share n_both/k within 0.17 of true 0.2
    val es = graft.ops.Sketches.overlapEstimate(a, b, "k", k = 64)
      .collect().head
    val kEff = es.getLong(0).toDouble
    assert(kEff == 64.0)
    assert(es.getLong(1) == 13L) // deterministic sketch: 13 shared in K
    val unionEst = (kEff - 1) * math.pow(2, 60) / es.getLong(4).toDouble
    assert(math.abs(unionEst - 500) / 500 < 0.4, s"unionEst=$unionEst")
    assert(math.abs(es.getLong(1) / kEff - 0.2) < 0.17,
      s"jaccard=${es.getLong(1) / kEff}")
    // empty inputs: all-zero row, no NULLs
    val empty = spark.emptyDataFrame.withColumn("k", lit("x"))
      .filter(lit(false))
    val z = graft.ops.Sketches.overlapEstimate(empty, empty, "k", k = 8)
      .collect().head
    assert((0 to 4).map(z.getLong(_)).toSeq == Seq(0L, 0L, 0L, 0L, 0L))
  }
}
