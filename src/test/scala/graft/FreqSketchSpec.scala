package graft

import graft.ops.Sketches
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries approx top-k: exact-regime equivalence, the N/capacity
  * error bound under forced decrements, and stability across partition
  * layouts (the partial-agg merge path).
  */
class FreqSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("freq-sketch-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("capacity >= distinct gives exact counts equal to the exact top-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 20000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      // zipf-ish: low keys much more frequent
      val v = s"v${math.min(rnd.nextInt(40), rnd.nextInt(40))}"
      (g, v)
    }
    val df = rows.toDF("grp", "value").repartition(8)
    val approx = Sketches.approxTopK(df, Seq("grp"), "value",
      k = 5, capacity = 1000)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    val exact = Sketches.heavyHitters(df, Seq("grp"), "value", k = 5)
      .select(col("grp"), col("value"), col("n"), col("rank"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(approx == exact)
  }

  test("error bound: every estimate within N/capacity of the true count") {
    import spark.implicits._
    val capacity = 8
    // 3 genuinely heavy items + a long tail of singletons forcing
    // decrements (tail >> capacity)
    val heavy = Seq.fill(400)("A") ++ Seq.fill(300)("B") ++ Seq.fill(200)("C")
    val tail = (1 to 500).map(i => s"t$i")
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle(heavy ++ tail).map(("g", _))
    val n = data.size
    val truth = data.groupBy(_._2).map { case (v, occ) => v -> occ.size.toLong }
    val got = Sketches.approxTopK(data.toDF("grp", "value").repartition(4),
      Seq("grp"), "value", k = 3, capacity = capacity)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // the three heavy items dominate N/capacity -> guaranteed present
    assert(got.keySet == Set("A", "B", "C"))
    got.foreach { case (v, est) =>
      val t = truth(v)
      assert(est <= t, s"$v over-estimated: $est > $t")
      assert(est >= t - n.toLong / capacity,
        s"$v under-estimated beyond bound: $est < $t - ${n / capacity}")
    }
  }

  test("exact regime is stable across partition layouts") {
    import spark.implicits._
    val rows = (1 to 5000).map(i => ("g", s"v${i % 50}"))
    val expect = Sketches.approxTopK(rows.toDF("grp", "value").coalesce(1),
      Seq("grp"), "value", k = 10, capacity = 200)
      .collect().map(_.toString).sorted
    for (parts <- Seq(2, 7, 16)) {
      val got = Sketches.approxTopK(
        rows.toDF("grp", "value").repartition(parts),
        Seq("grp"), "value", k = 10, capacity = 200)
        .collect().map(_.toString).sorted
      assert(got.sameElements(expect), s"layout $parts diverged")
    }
  }

  test("composes with Structured Streaming windowed aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // trending items per tumbling window: the MG buffer rides the
    // streaming state store (TypedImperativeAggregate serialization)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    val q = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(graft.functions.FreqSketch.approx_top_k(col("v"), 100, 2)
        .as("top"))
      .select(col("window.start").as("ws"), col("top"))
      .writeStream.format("memory").queryName("trending")
      .outputMode("append").start()
    def ts(min: Int) = new java.sql.Timestamp(3600_000L + min * 60_000L)
    mem.addData((ts(0), "x"), (ts(1), "x"), (ts(2), "y"), (ts(3), "x"))
    q.processAllAvailable()
    mem.addData((ts(60), "z")) // advance watermark, close the window
    q.processAllAvailable()
    val rows = spark.table("trending").collect()
    q.stop()
    assert(rows.length == 1)
    val top = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top == Seq(("x", 3L), ("y", 1L)))
  }

  test("rejects non-string children") {
    import spark.implicits._
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, 2)).toDF("g", "v")
        .groupBy("g")
        .agg(graft.functions.FreqSketch.approx_top_k(col("v"), 10, 3))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
