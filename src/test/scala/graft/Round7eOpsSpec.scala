package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 batch 5: embedding statistics (integer moments, PCA via
  * driver Jacobi), score normalization/winsorizing, the FIM transform,
  * and dialog context-budget truncation. Goldens are hand-computed or
  * pinned against in-test closed forms.
  */
class Round7eOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round7e-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.ops.{CorpusOps, DialogOps, Similarity, TextAnalysis}

  // --------------------------------------------- embedding moments

  test("embeddingMoments: hand-computed integer triangle; null and " +
      "wrong-dim vectors dropped") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.1f, 0.2f)),   // quantized at 100: (10, 20)
      (2L, Array(0.3f, 0.4f)),   //                   (30, 40)
      (3L, null.asInstanceOf[Array[Float]]),
      (4L, Array(1.0f))          // wrong dim
    ).toDF("vec_id", "embedding")
    val m = Similarity.embeddingMoments(vecs, dim = 2, quantScale = 100L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(m.size === 3) // upper triangle of d=2: (0,0) (0,1) (1,1)
    assert(m((0, 0)) === ((2L, 40L, 40L, 10L * 10 + 30L * 30)))
    assert(m((0, 1)) === ((2L, 40L, 60L, 10L * 20 + 30L * 40)))
    assert(m((1, 1)) === ((2L, 60L, 60L, 20L * 20 + 40L * 40)))
  }

  // ------------------------------------------------ Jacobi / PCA

  test("jacobiEigen: known 2x2 eigenpairs, orthonormal vectors") {
    // [[2,1],[1,2]] -> eigenvalues 3 and 1, vectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 &&
      math.abs(sorted(1) - 3.0) < 1e-12)
    // columns orthonormal
    val dot01 = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    val n0 = vecs(0)(0) * vecs(0)(0) + vecs(1)(0) * vecs(1)(0)
    assert(math.abs(dot01) < 1e-12 && math.abs(n0 - 1.0) < 1e-12)
  }

  test("pcaFit recovers a planted 2-dim subspace in R^4; pcaProject " +
      "coordinates match the closed form") {
    import spark.implicits._
    val r2 = (1.0 / math.sqrt(2.0)).toFloat
    // x = a·u + b·w, u = (1,1,0,0)/√2, w = (0,0,1,-1)/√2, a ⊥ b grids
    val as = Seq(-3f, -1f, 1f, 3f)            // var 5, mean 0
    val bs = Seq(-2f, -1f, 1f, 2f)            // var 2.5, mean 0
    val rows = for {
      (a, i) <- as.zipWithIndex; (b, j) <- bs.zipWithIndex
    } yield ((i * 4 + j).toLong,
      Array(a * r2, a * r2, b * r2, -b * r2))
    val df = rows.toDF("vec_id", "embedding")
    val model = Similarity.pcaFit(df, k = 3, dim = 4)
    assert(math.abs(model.eigenvalues(0) - 5.0) < 1e-3)
    assert(math.abs(model.eigenvalues(1) - 2.5) < 1e-3)
    assert(math.abs(model.eigenvalues(2)) < 1e-3) // planted rank is 2
    // top component = ±u; sign convention makes the big coords positive
    val c0 = model.components(0)
    assert(math.abs(c0(0) - 1.0 / math.sqrt(2)) < 1e-3 &&
      math.abs(c0(1) - 1.0 / math.sqrt(2)) < 1e-3 &&
      math.abs(c0(2)) < 1e-3 && math.abs(c0(3)) < 1e-3)
    // projection of row (a, b): component 0 = a, component 1 = ±b
    val proj = Similarity.pcaProject(df, model).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(math.abs(proj((0L, 0)) - (-3.0)) < 1e-3) // a = -3 row
    assert(math.abs(math.abs(proj((0L, 1))) - 2.0) < 1e-3) // |b| = 2
    // components mutually orthonormal
    val d01 = (0 until 4).map(i =>
      model.components(0)(i) * model.components(1)(i)).sum
    assert(math.abs(d01) < 1e-9)
  }

  // ------------------------------------------- score normalization

  test("normalizeScores zscore golden; constant column yields null") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    // mean 2.5, σ_pop = √1.25
    val out = CorpusOps.normalizeScores(df, "x").collect()
      .map(r => r.getDouble(0) -> r.getAs[java.lang.Double]("norm")).toMap
    assert(math.abs(out(1.0) - (-1.5 / math.sqrt(1.25))) < 1e-6)
    assert(math.abs(out(4.0) - (1.5 / math.sqrt(1.25))) < 1e-6)
    val const = Seq(7.0, 7.0, 7.0).toDF("x")
    assert(CorpusOps.normalizeScores(const, "x").collect()
      .forall(_.isNullAt(1)), "σ = 0 must normalize to null")
  }

  test("normalizeScores minmax and exact robust goldens; null value " +
      "passes through null") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double])](
      (1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(3.0)),
      (4L, Some(4.0)), (5L, Some(5.0)), (6L, None)).toDF("id", "x")
    val mm = CorpusOps.normalizeScores(df, "x", method = "minmax")
      .collect().map(r => Option(r.getAs[java.lang.Double]("x")) ->
        Option(r.getAs[java.lang.Double]("norm"))).toMap
    assert(mm(Some(1.0)) === Some(0.0) && mm(Some(5.0)) === Some(1.0) &&
      mm(Some(3.0)) === Some(0.5) && mm(None) === None)
    // exact robust: med 3, q1 2, q3 4 -> (x - 3)/2
    val rb = CorpusOps.normalizeScores(df, "x", method = "robust",
      exact = true).collect()
      .map(r => Option(r.getAs[java.lang.Double]("x")) ->
        Option(r.getAs[java.lang.Double]("norm"))).toMap
    assert(rb(Some(1.0)) === Some(-1.0) && rb(Some(4.0)) === Some(0.5))
    assert(rb(None) === None)
  }

  test("normalizeScores approx and exact robust agree on a bounded " +
      "integer lattice") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 17).toDouble).toDF("x")
    val ex = CorpusOps.normalizeScores(df, "x", method = "robust",
      exact = true).agg(sum("norm")).head().getDouble(0)
    val ap = CorpusOps.normalizeScores(df, "x", method = "robust")
      .agg(sum("norm")).head().getDouble(0)
    assert(math.abs(ex - ap) < 1e-6,
      s"sketch must be exact below its accuracy bound: $ex vs $ap")
  }

  test("winsorize exact golden: clamps into the quantile interval, " +
      "null stays null") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, Some(i.toDouble))) :+
      ((101L, Option.empty[Double]))).toDF("id", "x")
    val out = CorpusOps.winsorize(df, "x", pLo = 0.05, pHi = 0.95,
      exact = true).collect()
      .map(r => Option(r.getAs[java.lang.Double]("x")) ->
        Option(r.getAs[java.lang.Double]("winsorized"))).toMap
    // quantile_cont over 1..100: q05 = 5.95, q95 = 95.05
    assert(out(Some(1.0)) === Some(5.95))
    assert(out(Some(100.0)) === Some(95.05))
    assert(out(Some(50.0)) === Some(50.0)) // interior untouched
    assert(out(None) === None, "null value must winsorize to null")
  }

  // ------------------------------------------------ FIM transform

  test("fimTransform: parts reassemble to the original text; cuts in " +
      "range; deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""), (3L, "a"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fimTransform(docs).collect()
    assert(out.length === 3, "null text must be dropped")
    out.foreach { r =>
      val (text, lo, hi, fim) = (r.getString(1), r.getInt(2),
        r.getInt(3), r.getString(4))
      assert(lo >= 0 && lo <= hi && hi <= text.length)
      val pre = fim.stripPrefix("<PRE>")
      val Array(p, rest) = pre.split("<SUF>", 2)
      val Array(s, m) = rest.split("<MID>", 2)
      assert(p + m + s === text,
        s"prefix+middle+suffix must rebuild the doc: '$fim'")
      assert(p === text.substring(0, lo) && m === text.substring(lo, hi))
    }
    val again = TextAnalysis.fimTransform(docs).collect()
    assert(out.map(_.getString(4)).sorted
      .sameElements(again.map(_.getString(4)).sorted),
      "cuts are a pure function of (id, text)")
  }

  // ------------------------------------------- dialog truncation

  private def dlg(id: Long, turns: (String, String)*) = (id,
    turns.map { case (r, c) => Turn(r, c) })

  test("truncateDialogs: longest fitting suffix after a pinned system " +
      "turn (hand-computed)") {
    import spark.implicits._
    // sys cost 10; rest costs 5, 6, 7; budget 20 -> only turn 3 fits
    val dialogs = Seq(dlg(1L,
      ("system", "0123456789"), ("user", "aaaaa"),
      ("assistant", "bbbbbb"), ("user", "ccccccc")))
      .toDF("dialog_id", "turns")
    val r = DialogOps.truncateDialogs(dialogs, budget = 20).head()
    assert(r.getAs[Long]("n_kept") === 2L)
    assert(r.getAs[Long]("kept_chars") === 17L)
    val roles = r.getSeq[org.apache.spark.sql.Row](
      r.fieldIndex("turns_kept")).map(_.getString(0))
    assert(roles === Seq("system", "user"),
      "kept = system + the last fitting suffix (turn 3 only)")
  }

  test("truncateDialogs: system survives even over budget; no-system " +
      "dialogs keep the plain suffix; empty/null turns") {
    import spark.implicits._
    val dialogs = Seq(
      dlg(1L, ("system", "0123456789"), ("user", "aaaa")), // budget 3
      dlg(2L, ("user", "aaaa"), ("assistant", "bbbb")),     // no system
      (3L, Seq.empty[Turn]),
      (4L, null.asInstanceOf[Seq[Turn]]))
      .toDF("dialog_id", "turns")
    val out = DialogOps.truncateDialogs(dialogs, budget = 8).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_kept"),
        r.getAs[Long]("kept_chars")))).toMap
    assert(out(1L) === ((1L, 10L)),
      "over-budget system turn is still kept, alone")
    assert(out(2L) === ((2L, 8L)), "both non-system turns fit exactly")
    assert(out(3L) === ((0L, 0L)) && out(4L) === ((0L, 0L)))
  }

  test("truncateDialogs: whole dialog kept when the budget allows; " +
      "null content costs zero") {
    import spark.implicits._
    val dialogs = Seq(
      dlg(1L, ("system", "ss"), ("user", "uu"), ("assistant", "aa")),
      (2L, Seq(Turn("user", null), Turn("assistant", "xx"))))
      .toDF("dialog_id", "turns")
    val out = DialogOps.truncateDialogs(dialogs, budget = 100).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_kept"),
        r.getAs[Long]("kept_chars")))).toMap
    assert(out(1L) === ((3L, 6L)))
    assert(out(2L) === ((2L, 2L)), "null content = cost 0, turn kept")
  }
}
