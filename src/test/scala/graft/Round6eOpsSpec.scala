package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 7: k-fold assignment, n-per-group sampling, blocked
  * fuzzy join, streaming expectation gate.
  */
class Round6eOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round6e-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.ops.CorpusOps

  test("kFoldAssign: folds in range, deterministic, group mode keeps " +
      "every group in one fold") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"src${i % 7}")).toDF("id", "src")
    val plain = CorpusOps.kFoldAssign(df, "id", k = 5)
    val folds = plain.select("fold").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(folds.subsetOf((0 until 5).toSet) && folds.size > 1)
    val again = CorpusOps.kFoldAssign(df, "id", k = 5)
    assert(plain.collect().map(r => (r.getLong(0), r.getInt(2))).toSet ==
      again.collect().map(r => (r.getLong(0), r.getInt(2))).toSet)
    val grouped = CorpusOps.kFoldAssign(df, "id", k = 5,
      groupCol = Some("src"))
    val perGroup = grouped.groupBy("src")
      .agg(countDistinct(col("fold")).as("nf"))
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ == 1L)) // no group straddles folds
    intercept[IllegalArgumentException] {
      CorpusOps.kFoldAssign(df.withColumn("fold", lit(1)), "id", 5)
    }
  }

  test("takeNPerGroup: <= n per group, deterministic, groups smaller " +
      "than n survive whole") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, if (i <= 3) "tiny" else s"g${i % 4}"))
      .toDF("id", "grp")
    val out = CorpusOps.takeNPerGroup(df, Seq("grp"), n = 5, keyCol = "id")
    val sizes = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes("tiny") == 3L)
    assert(sizes.filter(_._1 != "tiny").values.forall(_ == 5L))
    val again = CorpusOps.takeNPerGroup(df, Seq("grp"), 5, "id")
    assert(out.collect().map(_.getLong(0)).toSet ==
      again.collect().map(_.getLong(0)).toSet)
  }

  test("blockedFuzzyJoin: only same-block candidates score; threshold " +
      "filters; exact duplicates hit 1.0") {
    import spark.implicits._
    val left = Seq(
      (1L, "en", "john maynard smith"),
      (2L, "en", "rosalind franklin"),
      (3L, "de", "werner heisenberg")
    ).toDF("l_id", "l_lang", "l_name")
    val right = Seq(
      (10L, "en", "john maynard smith"),   // exact, same block
      (11L, "en", "jon maynard smith"),    // fuzzy, same block
      (12L, "de", "rosalind franklin"),    // exact text, WRONG block
      (13L, "en", "charles darwin")        // same block, dissimilar
    ).toDF("r_id", "r_lang", "r_name")
    val out = graft.ops.Joins.blockedFuzzyJoin(left, right,
      Seq("l_lang" -> "r_lang"), "l_name", "r_name", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(6)))
    val pairs = out.map(p => (p._1, p._2)).toSet
    assert(pairs == Set((1L, 10L), (1L, 11L)))
    assert(out.find(p => p._2 == 10L).get._3 == 1.0)
    assert(out.find(p => p._2 == 11L).get._3 < 1.0)
  }

  test("blockedFuzzyJoin: rejects overlapping columns and empty blocks") {
    import spark.implicits._
    val l = Seq((1L, "x", "a")).toDF("id", "b", "nm")
    val r = Seq((2L, "x", "a")).toDF("id2", "b2", "nm2")
    intercept[IllegalArgumentException] {
      graft.ops.Joins.blockedFuzzyJoin(l, r, Nil, "nm", "nm2")
    }
    intercept[IllegalArgumentException] {
      graft.ops.Joins.blockedFuzzyJoin(l,
        r.withColumnRenamed("id2", "id"), Seq("b" -> "b2"), "nm", "nm2")
    }
  }

  test("expectationGatedIngest: clean batch lands, dirty batch " +
      "quarantined, audit logs both") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.ops.Profile.Expectation._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("eg-ck").toString
    val out = java.nio.file.Files.createTempDirectory("eg-out").toString
    val rej = java.nio.file.Files.createTempDirectory("eg-rej").toString
    val aud = java.nio.file.Files.createTempDirectory("eg-aud").toString
    val checks = Seq(NotNull("lang"), InSet("lang", Seq("en", "de")))
    val mem = MemoryStream[(Long, String)]
    def run(): Unit =
      graft.streaming.Streams.expectationGatedIngest(
        mem.toDF().toDF("doc_id", "lang"), checks, out, rej, aud, ckpt)
        .awaitTermination()
    mem.addData((1L, "en"), (2L, "de")) // batch 0: clean
    run()
    mem.addData((3L, "en"), (4L, "zz")) // batch 1: in_set violation
    run()
    val landed = spark.read.parquet(out).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val quarantined = spark.read.parquet(rej).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(landed == Set(1L, 2L))
    assert(quarantined == Set(3L, 4L)) // whole batch, evidence intact
    val audit = spark.read.parquet(aud).collect()
      .map(r => (r.getAs[Number]("batch_id").longValue,
        r.getAs[String]("check"), r.getAs[Long]("n_violations")))
    assert(audit.length == 4) // 2 checks x 2 batches
    assert(audit.filter(_._1 == 0L).forall(_._3 == 0L))
    assert(audit.exists(a => a._1 == 1L && a._2 == "in_set(lang)" &&
      a._3 == 1L))
  }
}
