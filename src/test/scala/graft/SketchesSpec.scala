package graft

import graft.ops.Sketches
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("sketches-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def data = {
    import spark.implicits._
    // 3 groups with known distinct cardinalities (500 / 200 / 50) and a
    // deterministic slice (day) per row
    (1 to 5000).map { i =>
      val g = i % 10 match {
        case x if x < 5 => ("a", i % 500)
        case x if x < 8 => ("b", i % 200)
        case _          => ("c", i % 50)
      }
      (g._1, s"u${g._2}", s"d${i % 7}")
    }.toDF("grp", "uid", "day")
  }

  test("HLL distinct within 5% of exact per group") {
    val exact = data.groupBy("grp").agg(countDistinct(col("uid")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.hllDistinct(data, Seq("grp"), "uid")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, n) <- exact) {
      val rel = math.abs(approx(g) - n) / n.toDouble
      assert(rel < 0.05, s"group $g: approx ${approx(g)} vs exact $n")
    }
  }

  test("HLL partial-sketch union is lossless vs direct sketch") {
    val direct = Sketches.hllDistinct(data, Seq("grp"), "uid")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Sketches.hllMerge(
      Sketches.hllPartials(data, Seq("grp"), "day", "uid"), Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct) // union of per-day sketches == unsliced sketch
  }

  test("heavyHitters: exact counts, deterministic tie-break") {
    import spark.implicits._
    val df = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("w") ++
      Seq("z")).map(("g", _)).toDF("grp", "v")
    val got = Sketches.heavyHitters(df, Seq("grp"), "v", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    // ties (y=3, w=3) break by value: w before y
    assert(got.toSeq == Seq(("x", 5L, 1), ("w", 3L, 2), ("y", 3L, 3)))
  }

  test("batch sessionize: strict-gap boundaries, per-key indexing") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(min * 60_000L)
    val ev = Seq(
      (1L, ts(0)), (1L, ts(30)),  // gap == 30min: NOT a boundary (strict >)
      (1L, ts(61)),               // gap 31min: new session
      (2L, ts(5)))                // separate key: own session 0
      .toDF("user_id", "ts")
    val got = graft.ops.Sessions.sessionize(ev, Seq("user_id"), "ts",
      gapSeconds = 1800)
      .select("user_id", "ts", "session_index").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, ts(0), 0L), (1L, ts(30), 0L), (1L, ts(61), 1L), (2L, ts(5), 0L)))
    val stats = graft.ops.Sessions.sessionStats(
      graft.ops.Sessions.sessionize(ev, Seq("user_id"), "ts", 1800),
      Seq("user_id"), "ts")
      .filter(col("user_id") === 1 && col("session_index") === 0).head()
    assert(stats.getAs[Long]("n_events") == 2L)
    assert(stats.getAs[Long]("duration_us") == 30L * 60 * 1000 * 1000)
  }

  test("vocab build + doc encoding: frequency rank, order, OOV") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "the dog zzz")).toDF("doc_id", "text")
    val vocab = graft.ops.TextAnalysis.buildVocab(docs)
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // rank by (count desc, term asc): the(3)=0, cat(2)=1, then dog/ran/sat/zzz
    assert(v("the") == 0L && v("cat") == 1L)
    assert(v("dog") == 2L && v("ran") == 3L && v("sat") == 4L && v("zzz") == 5L)

    val capped = graft.ops.TextAnalysis.buildVocab(docs, minCount = 2)
    val enc = graft.ops.TextAnalysis.encodeDocs(docs, capped)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // capped vocab: the=0, cat=1; everything else OOV=-1, order preserved
    assert(enc(1L) == Seq(0L, 1L, -1L))
    assert(enc(3L) == Seq(0L, -1L, -1L))
  }

  test("packByTokenBudget: exclusive-cumsum chunking per shard") {
    import spark.implicits._
    // one shard; budget 5; token counts 3,3,2,4 -> exclusive cums 0,3,6,8
    // -> packs 0,0,1,1
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f"), (3L, "g h"), (4L, "i j k l"))
      .toDF("doc_id", "text")
    val got = graft.ops.CorpusOps.packByTokenBudget(docs, budget = 5,
      nShards = 1, shardBy = Some(lit(0L)))
      .select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("approxQuantiles exact when group fits the summary") {
    import spark.implicits._
    val df = (1 to 1001).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val q = Sketches.approxQuantiles(df, Seq("grp"), "v",
      probs = Seq(0.25, 0.5, 0.75), accuracy = 10000)
      .select(explode(col("quantiles"))).collect().map(_.getDouble(0))
    // n=1001 < accuracy -> exact discrete quantiles
    assert(q.toSeq == Seq(251.0, 501.0, 751.0))
  }
}
