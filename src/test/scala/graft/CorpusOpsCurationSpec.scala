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

  test("sourceQuota caps every source and is deterministic") {
    import spark.implicits._
    val docs = (1 to 300).map(i => (i.toLong, s"src${i % 3}")).toDF("doc_id", "source")
    val capped = CorpusOps.sourceQuota(docs, "source", "doc_id", 40)
    val counts = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 40L))
    // small source below the cap passes through whole
    val withSmall = docs.union(Seq((9999L, "tiny")).toDF("doc_id", "source"))
    val c2 = CorpusOps.sourceQuota(withSmall, "source", "doc_id", 40)
      .filter(col("source") === "tiny").count()
    assert(c2 == 1)
    // deterministic across runs
    val a = capped.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = CorpusOps.sourceQuota(docs, "source", "doc_id", 40)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("repetitionRatio measures duplicate n-gram fraction") {
    import spark.implicits._
    val rows = Seq(
      ("a b a b a", 2),      // bigrams: ab,ba,ab,ba -> 2 distinct of 4 = 0.5
      ("w x y z", 2),        // all distinct -> 0.0
      ("solo", 2))           // shorter than n -> 0.0
      .toDF("text", "n")
    val got = rows.select(CorpusOps.repetitionRatio(col("text"), 2).as("r"))
      .collect().map(_.getDouble(0))
    assert(got(0) == 0.5 && got(1) == 0.0 && got(2) == 0.0)
  }

  test("chunkDocs covers the text with stride-aligned overlapping windows") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 95).map(i => s"t$i").mkString(" ")),
      (2L, "short doc")).toDF("doc_id", "text")
    val got = CorpusOps.chunkDocs(docs, chunkTokens = 40, stride = 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // starts at 0,30,60,90 -> 4 chunks; last has 5 tokens
    assert(d1.length == 4)
    assert(d1.map(_._4).toSeq == Seq(40L, 40L, 35L, 5L))
    assert(d1(1)._3.startsWith("t31 ") && d1(3)._3 == "t91 t92 t93 t94 t95")
    val d2 = got.filter(_._1 == 2L)
    assert(d2.length == 1 && d2(0)._4 == 2L && d2(0)._3 == "short doc")
  }

  test("suppressSmallGroups drops combinations rarer than k") {
    import spark.implicits._
    val df = (Seq.fill(5)(("u1", "click")) ++ Seq.fill(2)(("u1", "buy")) ++
      Seq.fill(3)(("u2", "click"))).zipWithIndex
      .map { case ((u, e), i) => (i.toLong, u, e) }
      .toDF("id", "user", "etype")
    val kept = CorpusOps.suppressSmallGroups(df, Seq("user", "etype"), 3)
    val combos = kept.select("user", "etype").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(combos == Set(("u1", "click"), ("u2", "click")))
    assert(kept.count() == 8)
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

  test("zscoreOutliers flags only beyond-threshold rows; constant groups flag none") {
    import spark.implicits._
    // group a: 20 values at ~10 plus one at 1000 -> only that row flags
    // group b: constant -> stddev 0 -> nothing (not a div-by-zero)
    val rows = ((1 to 20).map(i => ("a", i.toLong, 10.0 + (i % 3))) :+
      (("a", 99L, 1000.0))) ++ (1 to 10).map(i => ("b", 100L + i, 5.0))
    val got = CorpusOps.zscoreOutliers(
      rows.toDF("g", "id", "value"), "value", Seq("g"))
      .select("id", "zscore").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == Seq(99L))
    assert(got.head._2 > 3.0)
  }
}
