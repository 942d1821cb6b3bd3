package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 12: UniMax epoch materialization + streaming
  * decontamination gate.
  */
class Round6jOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .config("spark.ui.enabled", "false")
    .appName("round6j-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("unimaxApply: full epochs fan out, remainder lands as the " +
      "md5-order token prefix, zero-token sources emit nothing") {
    import spark.implicits._
    // source A: 2 docs x 5 tokens (n=10); B: 1 doc x 4 tokens (n=4);
    // C: a null-text source (n=0)
    val docs = Seq(
      (1L, "a b c d e", "A"), (2L, "f g h i j", "A"),
      (3L, "k l m n", "B"),
      (4L, null.asInstanceOf[String], "C"))
      .toDF("doc_id", "text", "source")
    // hand allocation: A quota 23 -> 2 full epochs + rem 3 (prefix = the
    // md5-first doc only: its 5 tokens cross the 3-token boundary but the
    // boundary doc is KEPT, the sourceTokenBudget rule); B quota 8 -> 2
    // full epochs, rem 0; C quota 0
    val alloc = Seq(("A", 10L, 23L), ("B", 4L, 8L), ("C", 0L, 0L))
      .toDF("source", "n_tokens", "quota")
    val got = graft.ops.CorpusOps.unimaxApply(docs, alloc)
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    // md5("1") < md5("2")? compute: the prefix doc of A is whichever
    // hashes first — assert structurally instead of pinning
    val fullPart = got.filter(_._2 < 2)
    assert(fullPart ==
      Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L), (3L, 0L), (3L, 1L)))
    val remPart = got.filter(_._2 == 2L)
    assert(remPart.size == 1 && Set(1L, 2L).contains(remPart.head._1))
    assert(!got.exists(_._1 == 4L)) // zero-token source: nothing, no DIV/0
  }

  test("unimaxApply + unimaxFromCorpus: token accounting lands within " +
      "one doc of each source's quota") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (1L to 60L).map { i =>
      val words = (1 to 3 + rnd.nextInt(10)).map(_ => "w").mkString(" ")
      (i, words, s"s${i % 3}")
    }.toDF("doc_id", "text", "source")
    val alloc = graft.ops.CorpusOps.unimaxFromCorpus(docs, budget = 300L,
      maxEpochs = 3)
    val applied = graft.ops.CorpusOps.unimaxApply(docs, alloc)
    val gotTokens = applied
      .withColumn("_nt", size(split(trim(col("text")), "\\s+")))
      .groupBy("source").agg(sum(col("_nt")).as("emitted"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val quotas = alloc.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    for ((src, n, q) <- quotas) {
      val maxDoc = 13L // max doc tokens in this corpus
      assert(gotTokens(src) >= q - maxDoc && gotTokens(src) < q + maxDoc,
        s"$src: emitted ${gotTokens(src)} vs quota $q")
    }
  }

  test("passAtK: Codex-estimator goldens — certain pass, undefined, " +
      "closed-form checks, null correct counts failed") {
    import spark.implicits._
    val samples = (
      // p1: n=10, c=2 -> pass@5 = 1 - C(8,5)/C(10,5) = 1 - 56/252
      (1 to 10).map(i => (1L, Some(i <= 2))) ++
      // p2: n=10, c=6 -> n-c=4 < 5 -> exactly 1.0
      (1 to 10).map(i => (2L, Some(i <= 6))) ++
      // p3: n=3 < k -> NULL
      (1 to 3).map(i => (3L, Some(true))) ++
      // p4: n=10, c=0 -> 0.0; one null correct counts as failed
      (1 to 9).map(_ => (4L, Some(false))) :+ (4L, Option.empty[Boolean])
    ).toDF("problem_id", "correct")
    val got = graft.ops.CorpusOps.passAtK(samples, k = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L) == ((10L, 2L,
      Some(BigDecimal(1.0 - 56.0 / 252.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))))
    assert(got(2L) == ((10L, 6L, Some(1.0))))
    assert(got(3L) == ((3L, 3L, None)))
    assert(got(4L) == ((10L, 0L, Some(0.0))))
    intercept[IllegalArgumentException] {
      graft.ops.CorpusOps.passAtK(samples, k = 0)
    }
    // reserved internal names rejected (the expr references n/c
    // unqualified — a colliding problem column would be ambiguous)
    intercept[IllegalArgumentException] {
      graft.ops.CorpusOps.passAtK(
        samples.withColumnRenamed("problem_id", "n"), k = 5,
        problemCol = "n")
    }
  }

  test("maskLeftmostLongest: goldens — longest wins at a shared start, " +
      "leftmost wins across starts, masking never cascades") {
    def mask(pats: Seq[String], text: String): String =
      new graft.functions.AhoCorasick(pats.toArray)
        .maskLeftmostLongest(text, "*").toString
    // nested: "hash join" beats its prefix "hash" at the same start
    assert(mask(Seq("hash", "hash join"), "a hash join b hash c") ==
      "a * b * c")
    // leftmost beats longer-but-later: "aa" at 0 wins over "ab" at 1
    assert(mask(Seq("aa", "ab"), "aab") == "*b")
    // adjacent non-overlapping both mask
    assert(mask(Seq("ab"), "abab") == "**")
    // selection runs on the ORIGINAL text: a '*'-containing pattern
    // matches pre-existing '*'s but a freshly written mask is never
    // rescanned (replace-chains would cascade here)
    assert(mask(Seq("*a"), "**a") == "**")
    // empty pattern ignored; null-free empty text round-trips
    assert(mask(Seq("", "x"), "axb") == "a*b")
    assert(mask(Seq("x"), "") == "")
  }

  test("maskLeftmostLongest: randomized equivalence with a brute-force " +
      "leftmost-longest reference") {
    val rnd = new scala.util.Random(11)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar)
      .mkString
    val pats = (1 to 12).map(_ => randStr(1 + rnd.nextInt(3))).distinct
    val ac = new graft.functions.AhoCorasick(pats.toArray)
    def brute(text: String): String = {
      val occ = for {
        p <- pats
        st <- Iterator.iterate(text.indexOf(p))(i =>
          text.indexOf(p, i + 1)).takeWhile(_ >= 0)
      } yield (st, st + p.length)
      val sb = new StringBuilder
      var pos = 0
      for ((st, en) <- occ.sortBy(t => (t._1, -(t._2 - t._1)))
           if st >= pos) {
        sb.append(text.substring(pos, st)).append("*"); pos = en
      }
      sb.append(text.substring(pos)).toString
    }
    for (_ <- 1 to 300) {
      val t = randStr(rnd.nextInt(30))
      assert(ac.maskLeftmostLongest(t, "*").toString == brute(t),
        s"text='$t'")
    }
  }

  test("decontaminationGatedIngest: leaking docs quarantine, clean docs " +
      "land, batch == stream verdict") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("dc-ck").toString
    val out = java.nio.file.Files.createTempDirectory("dc-out").toString
    val quar = java.nio.file.Files.createTempDirectory("dc-q").toString
    val eval = Seq((100L, "the secret benchmark question about turtles"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Option[Long], String)]
    mem.addData(
      (Some(1L), "a clean document with original words"),
      (Some(2L),
        "copied the secret benchmark question about turtles verbatim"),
      (Some(3L), "another clean one entirely"),
      // null id + contaminated: must quarantine (fail-closed), not land
      (None,
        "also has the secret benchmark question about turtles inside"))
    graft.streaming.Streams.decontaminationGatedIngest(
      mem.toDF().toDF("doc_id", "text"), eval, out, quar, ckpt)
      .awaitTermination()
    val landed = spark.read.parquet(out).collect()
      .map(r => Option(r.getAs[java.lang.Long]("doc_id"))
        .map(_.longValue)).toSet
    val quarRows = spark.read.parquet(quar).collect()
    val quarantined = quarRows
      .map(r => Option(r.getAs[java.lang.Long]("doc_id"))
        .map(_.longValue)).toSet
    assert(landed == Set(Some(1L), Some(3L)))
    assert(quarantined == Set(Some(2L), None))
    // evidence travels with the quarantined rows
    assert(quarRows.forall(r => r.getAs[Long]("n_eval_hits") == 1L &&
      r.getAs[Long]("max_shared") >= 2L &&
      r.getAs[Long]("first_eval_id") == 100L))
    // batch == stream verdict on the non-null-id rows
    val batchDirty = graft.ops.Dedup.decontaminate(
      Seq((1L, "a clean document with original words"),
        (2L, "copied the secret benchmark question about turtles verbatim"),
        (3L, "another clean one entirely")).toDF("doc_id", "text"),
      eval).select("train_id").collect().map(_.getLong(0)).toSet
    assert(batchDirty == Set(2L))
    // and a prebuilt-index probe equals the convenience form
    val idx = graft.ops.Dedup.evalShingleIndex(eval)
    val viaIdx = graft.ops.Dedup.decontaminateAgainstIndex(
      Seq((2L, "copied the secret benchmark question about turtles " +
        "verbatim")).toDF("doc_id", "text"), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaIdx.toSeq == Seq((2L, 100L)))
  }
}
