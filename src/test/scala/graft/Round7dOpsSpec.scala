package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 batch 4: annotation-agreement completions (McNemar,
  * Spearman counts, Krippendorff's alpha) and preference-data ops
  * (DPO pairs, win matrix, Bradley–Terry). Golden values are
  * hand-computed or pinned against an in-test brute-force reference.
  */
class Round7dOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round7d-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.ops.{CorpusOps, Preference, TextAnalysis}

  // ---------------------------------------------------------- McNemar

  test("mcnemarCounts: hand-computed cells; null pred = wrong, " +
      "null truth dropped") {
    import spark.implicits._
    // (truth, a, b): cells — (y,y,y)=11, (y,y,n)=10, (y,n,y)=01,
    // (y,n,n)=00, null-truth dropped, null-pred-b counts as b-wrong
    val df = Seq[(String, String, String)](
      ("y", "y", "y"), ("y", "y", "y"),          // n11 = 2
      ("y", "y", "n"),                           // n10 = 1
      ("y", "n", "y"), ("y", "n", "y"), ("y", "n", "y"), // n01 = 3
      ("y", "n", "n"),                           // n00 = 1
      ("y", "y", null),                          // b null -> n10
      (null, "y", "y")                           // truth null -> drop
    ).toDF("t", "a", "b")
    val r = CorpusOps.mcnemarCounts(df, "t", "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((1L, 3L, 2L, 2L))) // (n00, n01, n10, n11)
  }

  // ----------------------------------------------------- Spearman

  private def rho(r: org.apache.spark.sql.Row): Double = {
    val (n, sa, sb, sa2, sb2, sab) = (r.getLong(0).toDouble,
      r.getLong(1).toDouble, r.getLong(2).toDouble, r.getLong(3).toDouble,
      r.getLong(4).toDouble, r.getLong(5).toDouble)
    (n * sab - sa * sb) /
      math.sqrt((n * sa2 - sa * sa) * (n * sb2 - sb * sb))
  }

  test("spearmanCounts: perfect monotone = +1, reversed = -1, and " +
      "s_a invariant n*(n+1)") {
    import spark.implicits._
    val up = Seq((1, 10), (2, 20), (3, 35), (4, 70), (5, 71))
      .toDF("a", "b")
    val r1 = CorpusOps.spearmanCounts(up, "a", "b").collect()(0)
    assert(math.abs(rho(r1) - 1.0) < 1e-12)
    assert(r1.getLong(1) === r1.getLong(0) * (r1.getLong(0) + 1)) // s_a
    val down = up.withColumn("b", -col("b"))
    val r2 = CorpusOps.spearmanCounts(down, "a", "b").collect()(0)
    assert(math.abs(rho(r2) + 1.0) < 1e-12)
  }

  test("spearmanCounts with ties matches the average-rank brute force") {
    import spark.implicits._
    val data = Seq((1, 5), (1, 9), (2, 5), (3, 7), (3, 5), (4, 9),
      (4, 1), (5, 2))
    val df = data.toDF("a", "b")
    // brute force: average ranks then Pearson
    def avgRanks(xs: Seq[Int]): Seq[Double] = {
      val sorted = xs.sorted
      xs.map { v =>
        val lo = sorted.indexOf(v) + 1
        val hi = sorted.lastIndexOf(v) + 1
        (lo + hi) / 2.0
      }
    }
    val ra = avgRanks(data.map(_._1))
    val rb = avgRanks(data.map(_._2))
    val n = data.size.toDouble
    val (ma, mb) = (ra.sum / n, rb.sum / n)
    val cov = ra.zip(rb).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val va = ra.map(x => (x - ma) * (x - ma)).sum
    val vb = rb.map(y => (y - mb) * (y - mb)).sum
    val expected = cov / math.sqrt(va * vb)
    val r = CorpusOps.spearmanCounts(df, "a", "b").collect()(0)
    assert(math.abs(rho(r) - expected) < 1e-12)
  }

  // ------------------------------------------------- Krippendorff

  /** Fold the card into alpha:
    * 1 - (n-1) * sum_m d_m/(m-1) / (n^2 - sq_sum). */
  private def alphaFromCard(rows: Array[org.apache.spark.sql.Row]): Double = {
    val n = rows.head.getLong(3).toDouble
    val sq = rows.head.getLong(4).toDouble
    val inner = rows.map(r =>
      r.getLong(2).toDouble / (r.getLong(0) - 1).toDouble).sum
    1.0 - (n - 1) * inner / (n * n - sq)
  }

  test("krippendorffAlpha matches an in-test pairwise brute force " +
      "(missing ratings, variable raters per unit)") {
    import spark.implicits._
    // unit, rater, value — unit 4 has one rating (unpairable, drops);
    // unit 5 has a duplicate (u,r) that collapses to min value "a"
    val df = Seq(
      (1, "r1", "a"), (1, "r2", "a"), (1, "r3", "b"),
      (2, "r1", "b"), (2, "r2", "b"),
      (3, "r1", "a"), (3, "r2", "c"), (3, "r3", "c"), (3, "r4", "c"),
      (4, "r1", "a"),
      (5, "r2", "b"), (5, "r2", "c"), (5, "r3", "a"),
      (6, "r1", "c"), (6, "r4", "c")
    ).toDF("u", "r", "v")
    val card = CorpusOps.krippendorffAlpha(df, "u", "r", "v")
      .orderBy("m").collect()
    // brute force over the SAME cleaned data (dup collapsed to min)
    val clean = Seq(
      (1, "a"), (1, "a"), (1, "b"),
      (2, "b"), (2, "b"),
      (3, "a"), (3, "c"), (3, "c"), (3, "c"),
      (5, "b"), (5, "a"),
      (6, "c"), (6, "c"))
    val byUnit = clean.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val pairable = byUnit.filter(_.size >= 2)
    val n = pairable.map(_.size).sum.toDouble
    val doU = pairable.map { vs =>
      val m = vs.size
      val dis = (for (i <- vs.indices; j <- vs.indices if i != j)
        yield if (vs(i) != vs(j)) 1 else 0).sum
      dis.toDouble / (m - 1)
    }.sum / n
    val marg = pairable.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val de = marg.keys.toSeq.combinations(2).map { cs =>
      2.0 * marg(cs(0)) * marg(cs(1))
    }.sum / (n * (n - 1))
    val expected = 1.0 - doU / de
    assert(math.abs(alphaFromCard(card) - expected) < 1e-12)
    // the card's own invariants
    assert(card.map(_.getLong(0)).toSeq === card.map(_.getLong(0))
      .toSeq.sorted)
    assert(n === card.head.getLong(3).toDouble)
  }

  test("krippendorffAlpha: perfect agreement = 1") {
    import spark.implicits._
    val df = Seq((1, "r1", "x"), (1, "r2", "x"), (2, "r1", "y"),
      (2, "r2", "y"), (2, "r3", "y")).toDF("u", "r", "v")
    val card = CorpusOps.krippendorffAlpha(df, "u", "r", "v").collect()
    assert(math.abs(alphaFromCard(card) - 1.0) < 1e-12)
  }

  // -------------------------------------------------- distinct-n

  test("distinctN: hand-computed unique/total n-gram counts") {
    import spark.implicits._
    val docs = Seq(("g1", "the cat the cat"), ("g1", "the dog"),
      ("g2", "a a a"), ("g2", null)).toDF("src", "text")
    val r = TextAnalysis.distinctN(docs, "src", "text", maxN = 2)
      .orderBy("group", "n")
      .collect().map(x => (x.getString(0), x.getInt(1), x.getLong(2),
        x.getLong(3)))
    // g1 unigrams: the×3, cat×2, dog×1 -> (3, 6); bigrams:
    // "the cat"×2, "cat the"×1, "the dog"×1 -> (3, 4)
    // g2 unigrams: a×3 -> (1, 3); bigrams: "a a"×2 -> (1, 2)
    assert(r === Array(("g1", 1, 3L, 6L), ("g1", 2, 3L, 4L),
      ("g2", 1, 1L, 3L), ("g2", 2, 1L, 2L)))
  }

  // ------------------------------------------- preference pairs

  test("preferencePairs: strict margin, tie-breaks, null drops") {
    import spark.implicits._
    def jl(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    val df = Seq[(String, java.lang.Long, Double)](
      ("p1", jl(1L), 10.0), ("p1", jl(2L), 30.0), ("p1", jl(3L), 30.0),
      ("p1", jl(4L), 10.0),                    // chosen 3 (max id@max),
                                               // rejected 1 (min id@min)
      ("p2", jl(5L), 7.0), ("p2", jl(6L), 7.0), // zero margin -> dropped
      ("p3", jl(7L), 1.0), ("p3", null, 99.0), // null completion drops
      (null, jl(8L), 5.0)                      // null prompt drops
    ).toDF("prompt", "completion", "score")
    val r = Preference.preferencePairs(df, "prompt", "completion", "score")
      .orderBy("prompt").collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getString(0) === "p1")
    assert(row.getLong(1) === 3L)       // chosen_id
    assert(row.getDouble(2) === 30.0)
    assert(row.getLong(3) === 1L)       // rejected_id
    assert(row.getDouble(4) === 10.0)
    assert(row.getDouble(5) === 20.0)   // margin
    assert(row.getLong(6) === 4L)       // n_completions
  }

  // ------------------------------------------------- win matrix

  test("winMatrix: orientation-normalized counts") {
    import spark.implicits._
    val df = Seq(
      ("gpt", "claude", "b"), ("claude", "gpt", "a"), // claude wins x2
      ("gpt", "claude", "a"),                          // gpt wins
      ("claude", "gpt", "tie"),
      ("llama", "claude", "b"),                        // claude wins
      ("x", "x", "a")                                  // self-battle drops
    ).toDF("ma", "mb", "w")
    val r = Preference.winMatrix(df, "ma", "mb", "w")
      .orderBy("model_1", "model_2").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(r === Array(
      ("claude", "gpt", 2L, 1L, 1L, 4L),
      ("claude", "llama", 1L, 0L, 0L, 1L)))
  }

  // ---------------------------------------------- Bradley–Terry

  test("bradleyTerry 2-player fixed point: strength ratio = win ratio") {
    import spark.implicits._
    val battles = (Seq.fill(6)(("A", "B", "a")) ++
      Seq.fill(2)(("A", "B", "b"))).toDF("ma", "mb", "w")
    val r = Preference.bradleyTerry(battles, "ma", "mb", "w", iters = 60)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("A") / r("B") - 3.0) < 1e-9) // 6:2
    // mean-1 normalization
    assert(math.abs((r("A") + r("B")) / 2 - 1.0) < 1e-12)
  }

  test("bradleyTerry: planted transitive triple ranks A > B > C") {
    import spark.implicits._
    val battles = (Seq.fill(8)(("A", "B", "a")) ++
      Seq.fill(2)(("A", "B", "b")) ++
      Seq.fill(8)(("B", "C", "a")) ++
      Seq.fill(2)(("B", "C", "b")) ++
      Seq.fill(5)(("A", "C", "a")) ++
      Seq.fill(5)(("A", "C", "tie"))).toDF("ma", "mb", "w")
    val r = Preference.bradleyTerry(battles, "ma", "mb", "w")
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("A") > r("B") && r("B") > r("C"))
    val games = Preference.bradleyTerry(battles, "ma", "mb", "w",
      iters = 1).collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(games("A") === 20L && games("B") === 20L && games("C") === 20L)
  }
}
