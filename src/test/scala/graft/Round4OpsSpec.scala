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
