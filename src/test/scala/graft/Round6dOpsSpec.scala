package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 6: Poisson bootstrap, Fleiss' kappa, generic
  * PageRank, TextRank keywords.
  */
class Round6dOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round6d-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.ops.CorpusOps

  test("poissonBootstrap: reps rows; n_correct <= n; all-correct input " +
      "has n_correct == n; deterministic; mean multiplicity ~ 1") {
    import spark.implicits._
    val scored = (1L to 400L).map(i =>
      (i, "en", if (i % 4 == 0) "de" else "en")).toDF("id", "lab", "prd")
    val out = CorpusOps.poissonBootstrap(scored, "id", "lab", "prd",
      reps = 16).collect()
    assert(out.length == 16)
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
    val again = CorpusOps.poissonBootstrap(scored, "id", "lab", "prd",
      reps = 16).collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet ==
      again.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet)
    // Poisson(1) multiplicities: mean n per replicate ~ 400 (+-20%)
    val meanN = out.map(_.getLong(1)).sum.toDouble / 16
    assert(meanN > 320 && meanN < 480, s"meanN=$meanN")
    val allOk = scored.withColumn("prd", col("lab"))
    assert(CorpusOps.poissonBootstrap(allOk, "id", "lab", "prd", reps = 4)
      .collect().forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("fleissKappa: hand-computed golden; null ratings drop") {
    import spark.implicits._
    // 3 items x 2 raters: (a,a), (a,b), (b,b) -> N=3, n=2,
    // s2 = 4 + (1+1) + 4 = 10; p_a = p_b = 3 -> p2 = 18
    // (kappa = (Po - Pe)/(1 - Pe) = (2/3 - 1/2)/(1/2) = 1/3 downstream)
    val ratings = Seq(
      (1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (3L, "b"),
      (1L, null: String), (2L, null: String), (3L, null: String)
    ).toDF("item", "label")
    val r = CorpusOps.fleissKappa(ratings, "item", "label").collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3)) == ((3L, 2L, 10L, 18L)))
  }

  test("fleissKappa: empty/all-null input yields clean integer zeros, " +
      "not NULLs through the guard") {
    import spark.implicits._
    val ratings = Seq((1L, null: String), (2L, null: String))
      .toDF("item", "label")
    val r = CorpusOps.fleissKappa(ratings, "item", "label").collect()
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3)) == ((0L, 0L, 0L, 0L)))
  }

  test("fleissKappa: unequal rater counts raise in-plan") {
    import spark.implicits._
    val ratings = Seq((1L, "a"), (1L, "a"), (2L, "b"))
      .toDF("item", "label")
    val e = intercept[Exception] {
      CorpusOps.fleissKappa(ratings, "item", "label")
    }
    assert(e.getMessage.contains("same number of raters") ||
      Option(e.getCause).exists(_.getMessage
        .contains("same number of raters")))
  }

  test("pageRank: 3-leaf star matches the closed-form fixpoint; " +
      "direction/self-loops/nulls ignored") {
    import spark.implicits._
    val edges = Seq(
      (Some("c"), Some("l1")), (Some("l2"), Some("c")),
      (Some("c"), Some("l3")), (Some("c"), Some("c")),
      (None, Some("c"))
    ).toDF("src", "dst")
    val out = graft.graph.GraphOps.pageRank(edges, tol = 0.0,
      maxIter = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // fixpoint: c = 0.15 + 0.85*3*l_contrib, l = 0.15 + 0.85*c/3
    // -> c = 1.91892, l = 0.69369
    assert(math.abs(out("c") - 1.91892) < 1e-3, out.toString)
    Seq("l1", "l2", "l3").foreach(l =>
      assert(math.abs(out(l) - 0.69369) < 1e-3, out.toString))
  }

  test("textRankKeywords: planted hub word ranks first; deterministic") {
    import spark.implicits._
    val docs = (1 to 30).map(i =>
      (i.toLong, s"hub alpha hub beta hub gamma hub delta w$i hub"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .textRankKeywords(docs, k = 3, minCount = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.head._1 == "hub", out.mkString(", "))
    val again = graft.ops.TextAnalysis
      .textRankKeywords(docs, k = 3, minCount = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == again.toSeq)
  }
}
