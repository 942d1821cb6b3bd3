package graft

import graft.ops.CorpusOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsCurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("corpus-curation-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("hashSplit is stable under corpus growth and roughly proportional") {
    import spark.implicits._
    val small = (1 to 500).toDF("k")
      .select(col("k"), CorpusOps.hashSplit("k", 80, 10).as("split"))
    val big = (1 to 5000).toDF("k")
      .select(col("k"), CorpusOps.hashSplit("k", 80, 10).as("split"))
    // adding rows never reshuffles existing assignments
    val sm = small.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val bg = big.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(sm.forall { case (k, v) => bg(k) == v })
    // proportions near 80/10/10 on 5000 keys
    val counts = big.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 4000L) < 300)
    assert(math.abs(counts("val") - 500L) < 150)
    assert(math.abs(counts("test") - 500L) < 150)
  }

  test("stratifiedKeep applies per-stratum rates deterministically") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("k", "lang")
    val kept = df.filter(CorpusOps.stratifiedKeep("k", "lang",
      Map("en" -> 50), defaultPct = 10))
    val counts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("en") - 500L) < 120) // 50% of 1000
    assert(math.abs(counts.getOrElse("fr", 0L) - 100L) < 60) // 10% of 1000
    // deterministic: same filter twice -> same rows
    val a = kept.select("k").collect().map(_.getInt(0)).sorted
    val b = df.filter(CorpusOps.stratifiedKeep("k", "lang",
      Map("en" -> 50), defaultPct = 10))
      .select("k").collect().map(_.getInt(0)).sorted
    assert(a.sameElements(b))
  }

  test("lengthBand trims the tails within each stratum") {
    import spark.implicits._
    val docs = (1 to 100).map(i => (i, "en", "x" * i)).toDF("id", "lang", "text")
    val kept = CorpusOps.lengthBand(docs, "text", "lang", 0.05, 0.95)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(!kept.contains(1) && !kept.contains(100)) // tails dropped
    assert(kept.contains(50))
    assert(kept.size < 100 && kept.size > 80)
  }

  test("scrubText redacts emails and long digit runs, keeps prose") {
    import spark.implicits._
    val rows = Seq(
      ("contact a.b+c@mail.example.org today", "contact <EMAIL> today"),
      ("id 12345678901 and 1234 stay", "id <NUM> and 1234 stay"),
      ("plain text untouched", "plain text untouched"))
      .toDF("in", "want")
    val got = rows.select(col("want"),
      CorpusOps.scrubText(col("in")).as("got")).collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0)))
  }
}
