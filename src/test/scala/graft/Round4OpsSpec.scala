package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 operators: word entropy, hopping windows, cube lattice. */
class Round4OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("round4-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("wordEntropy matches hand-computed Shannon entropy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"),   // one distinct token -> H = 0
      (2L, "a b c d"),               // uniform over 4 -> H = 2 bits
      (3L, "a a b"),                 // H = -(2/3 lg 2/3 + 1/3 lg 1/3)
      (4L, "Mixed  MIXED mixed")     // case-folded + multi-space -> H = 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.wordEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((4L, 1L, 0.0)))
    assert(got(2L) == ((4L, 4L, 2.0)))
    assert(got(3L)._1 == 3L && got(3L)._2 == 2L)
    assert(math.abs(got(3L)._3 - 0.918296) < 1e-9) // round-6 of 0.91829583
    assert(got(4L) == ((3L, 1L, 0.0)))
  }

  test("hopping window fans each event into exactly width/slide windows") {
    import spark.implicits._
    val events = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:11:30"), "view", 3.0)
    ).toDF("ts", "event_type", "value")
    val agg = events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .select(col("window.start").cast("string").as("ws"), col("event_type"),
        col("n"), col("sv"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // every event is counted twice across the window set
    assert(agg.map(_._3).sum == events.count() * 2)
    // boundary event (00:05:00) belongs to [00:00,00:10) and [00:05,00:15)
    val clickWindows = agg.filter(_._2 == "click").map(_._1).sorted
    assert(clickWindows.contains("2024-01-01 00:00:00") &&
      clickWindows.contains("2024-01-01 00:05:00"))
  }

  test("wordEntropy invariants: 0 <= H <= log2(n_distinct), on random docs") {
    import spark.implicits._
    val words = Array("key", "agg", "row", "scan", "slow", "fast", "table")
    val r = new scala.util.Random(11)
    val docs = (1 to 60).map(i =>
      (i.toLong, Seq.fill(1 + r.nextInt(40))(words(r.nextInt(words.length)))
        .mkString(" ")))
      .toDF("doc_id", "text")
    TextAnalysis.wordEntropy(docs).collect().foreach { row =>
      val (n, dist, h) = (row.getLong(1), row.getLong(2), row.getDouble(3))
      assert(h >= 0.0, s"negative entropy $h")
      // rounding is 6 dp, allow that slack above the bound
      assert(h <= math.log(dist.toDouble) / math.log(2.0) + 1e-6,
        s"H=$h exceeds log2($dist)")
      assert(dist <= n)
      if (dist == 1) assert(h == 0.0)
    }
  }

  test("incremental dedup invariants on random corpus/batch splits") {
    import spark.implicits._
    val r = new scala.util.Random(23)
    // texts drawn from a small pool -> plenty of dups across the split
    val pool = (1 to 12).map(i => s"text body $i")
    val all = (1 to 120).map(i => (i.toLong, pool(r.nextInt(pool.length))))
    val corpus = all.filter(_._1 <= 60).toDF("doc_id", "text")
    val batch = all.filter(_._1 > 60).toDF("doc_id", "text")
    val kept = graft.ops.Dedup.incremental(corpus, batch)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpusTexts = all.filter(_._1 <= 60).map(_._2).toSet
    // kept rows are batch rows, novel vs corpus, unique within batch,
    // and are the min-id representative of their batch duplicate group
    val batchByText = all.filter(_._1 > 60).groupBy(_._2)
    assert(kept.forall { case (_, t) => !corpusTexts.contains(t) })
    assert(kept.map(_._2).distinct.length == kept.length)
    kept.foreach { case (id, t) =>
      assert(id == batchByText(t).map(_._1).min)
    }
    // completeness: every novel batch text is represented
    val novel = batchByText.keySet -- corpusTexts
    assert(kept.map(_._2).toSet == novel)
  }

  test("incremental dedup keeps only batch docs novel vs corpus and batch") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "existing doc two")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "THE  quick   Brown fox"), // normalized dup of corpus doc 1
      (11L, "a genuinely new doc"),
      (12L, "a genuinely new doc"),    // within-batch dup, 11 wins
      (13L, "another new one")).toDF("doc_id", "text")
    val kept = graft.ops.Dedup.incremental(corpus, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L))
    // injectable fingerprint: exact md5 has no normalization, 10 survives
    val keptMd5 = graft.ops.Dedup.incremental(corpus, batch,
      fingerprint = org.apache.spark.sql.functions.md5(_))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptMd5 == Set(10L, 11L, 13L))
  }

  test("resizeImages preserves aspect, never upscales, truncates bytes") {
    import spark.implicits._
    import graft.ops.Multimodal
    import graft.ops.Multimodal.Asset
    def asset(id: Long, w: Int, h: Int, n: Int) =
      Asset(id, "image", Array.tabulate[Byte](n)(_.toByte), "image/jpeg",
        w, h, 0L)
    val assets = Seq(
      asset(1, 64, 48, 4000),  // landscape: 0.5 scale -> 32x24
      asset(2, 48, 64, 4000),  // portrait: 32/64 binds -> 24x32
      asset(3, 10, 10, 4000),  // already inside the box: untouched
      asset(4, 100, 10, 50),   // wide: 32/100 -> 32x3; fewer bytes than box
      Asset(5, "video", Array[Byte](1, 2), "video/mp4", 0, 0, 1000L))
      .toDS()
    val got = Multimodal.resizeImages(assets, 32, 32).collect()
      .map(r => r.asset_id -> ((r.width, r.height, r.bytes.length))).toMap
    assert(got(1L) == ((32, 24, 768)))
    assert(got(2L) == ((24, 32, 768)))
    assert(got(3L) == ((10, 10, 100)))   // no upscale, 10*10 bytes kept
    assert(got(4L) == ((32, 3, 50)))     // shorter payload than pixel count
    assert(!got.contains(5L))            // non-images filtered out
  }

  test("cube produces the full grouping-set lattice with grouping ids") {
    import spark.implicits._
    val df = Seq(("A", "x", 1L), ("A", "y", 2L), ("B", "x", 3L))
      .toDF("f", "s", "v")
    val got = df.cube("f", "s")
      .agg(sum("v").as("sv"), grouping_id().cast("int").as("gid"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getInt(3)))
      .toSet
    assert(got.contains((Some("A"), Some("x"), 1L, 0)))
    assert(got.contains((Some("A"), None, 3L, 1)))     // per-f subtotal
    assert(got.contains((None, Some("x"), 4L, 2)))     // per-s subtotal
    assert(got.contains((None, None, 6L, 3)))          // grand total
    assert(got.size == 3 + 2 + 2 + 1) // 3 detail pairs + f + s + total
  }
}
