package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.graft.rangeJoin.binWidth", "100")
    .config("spark.ui.enabled", "false")
    .appName("extensions-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def data = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = (1 to 200).map(i =>
      (i.toLong, (i % 3).toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "k", "t")
    val intervals = (1 to 50).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, (i % 3).toLong, s, s + rnd.nextInt(220).toLong)
    }.toDF("iid", "k2", "lo", "hi")
    (points, intervals)
  }

  test("naive range-predicate join is rewritten to a binned equi-join") {
    val (points, intervals) = data
    val joined = points.join(intervals,
      col("k") === col("k2") && col("t") >= col("lo") && col("t") <= col("hi"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join should rewrite to a hash join, got:\n$plan")

    // results identical to brute force
    import spark.implicits._
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ps = points.as[(Long, Long, Long)].collect()
    val ivs = intervals.as[(Long, Long, Long, Long)].collect()
    val brute = (for {
      (pid, k, t) <- ps
      (iid, k2, lo, hi) <- ivs
      if k == k2 && t >= lo && t <= hi
    } yield (pid, iid)).toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("rewrite is off at binWidth=0 (falls back to nested loop)") {
    val (points, intervals) = data
    spark.conf.set("spark.graft.rangeJoin.binWidth", "0")
    try {
      val plan = points.join(intervals,
        col("k") === col("k2") && col("t") >= col("lo") && col("t") <= col("hi"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct") ||
        plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.graft.rangeJoin.binWidth", "100")
  }

  test("inverted intervals (end < start) are dropped, not fanned out") {
    import spark.implicits._
    val points = (0L until 50L).map(t => (t, t)).toDF("pid", "t")
    // iid=2 is dirty: hi < lo with bounds ~1e9 apart — an unfiltered
    // Sequence would step downward through ~1e7 bins (or throw)
    val intervals = Seq((1L, 10L, 20L), (2L, 1000000000L, 30L), (3L, 40L, 45L))
      .toDF("iid", "lo", "hi")
    val joined = points.join(intervals,
      col("t") >= col("lo") && col("t") <= col("hi"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = ((10L to 20L).map((_, 1L)) ++ (40L to 45L).map((_, 3L))).toSet
    assert(got == want)
  }

  test("kernel expressions are SQL-callable via the extension") {
    val r = spark.sql(
      "SELECT clean_html('<b>Energy &amp; Climate</b>') AS t, " +
        "normalize_doi('https://doi.org/10.1/x.') AS d, " +
        "round(name_similarity('Will Usher', 'W Usher'), 4) AS s").head()
    assert(r.getString(0) == "Energy & Climate")
    assert(r.getString(1) == "10.1/x")
    assert(r.getDouble(2) > 0.5)
  }

  test("approx_top_k aggregate is SQL-callable via the extension") {
    import spark.implicits._
    (Seq.fill(30)("x") ++ Seq.fill(20)("y") ++ Seq.fill(5)("z"))
      .toDF("v").createOrReplaceTempView("vals")
    val top = spark.sql(
      "SELECT approx_top_k(v, 100, 2) AS t FROM vals").head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top == Seq(("x", 30L), ("y", 20L)))
    val err = intercept[Exception] {
      spark.sql("SELECT approx_top_k(v, v, 2) FROM vals").head()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("min_k aggregate is SQL-callable via the extension") {
    import spark.implicits._
    Seq(5L, 3L, 9L, 3L, 1L, 7L).toDF("v").createOrReplaceTempView("mkvals")
    assert(spark.sql("SELECT min_k(v, 3) FROM mkvals").head()
      .getSeq[Long](0) == Seq(1L, 3L, 5L))
    // string child; set semantics dedupe
    Seq("b", "a", "c", "a").toDF("s").createOrReplaceTempView("mkstr")
    assert(spark.sql("SELECT min_k(s, 2) FROM mkstr").head()
      .getSeq[String](0) == Seq("a", "b"))
  }

  test("corpus kernels are SQL-callable via the extension") {
    val r = spark.sql(
      "SELECT simhash64('the quick brown fox') AS sh, " +
        "doc_fingerprint('the quick brown fox') AS fp, " +
        "lang_id('the cat sat on the mat and it was happy there') AS lang, " +
        "token_count_bpeish('hello world, again') AS tc, " +
        "cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS cos, " +
        "size(minhash_sig('a b c d e f g h', 3, 16)) AS nsig, " +
        "size(word_shingles('a b c d', 2)) AS nsh, " +
        "size(winnow('abcdefghijklmnop', 4, 3)) AS nwin, " +
        "winnow_positions('abcdefghijklmnop', 4, 3) AS wpos, " +
        "repetition_stats('a b a b', 2, '\\n') AS reps, " +
        "deflate_len('the quick brown fox') AS dl").head()
    assert(r.getLong(0) != 0L && r.getLong(1) != 0L)
    assert(r.getString(2) == "en")
    assert(r.getInt(3) > 0)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-9)
    assert(r.getInt(5) == 16)
    assert(r.getInt(6) == 3)
    assert(r.getInt(7) > 0)
    val wpos = r.getSeq[Long](8)
    assert(wpos.nonEmpty && wpos.forall(p => p >= 1 && p <= 13))
    // 'a b' occurs twice among the three bigrams of "a b a b"
    assert(r.getStruct(9).getAs[String]("top_gram") == "a b")
    assert(r.getInt(10) ==
      graft.functions.CorpusKernels.deflateLen("the quick brown fox"))
  }

  test("every custom expression compiles under CODEGEN_ONLY factory mode") {
    // a broken doGenCode would silently fall back to interpreted eval in a
    // normal session; CODEGEN_ONLY turns that into a hard failure
    val strict = spark.newSession()
    strict.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    strict.conf.set("spark.sql.codegen.fallback", "false")
    import strict.implicits._
    val df = Seq(("the quick brown fox jumps", Seq(1.0f, 2.0f))).toDF("t", "v")
    df.createOrReplaceTempView("codegen_probe")
    val row = strict.sql(
      "SELECT clean_html(t), normalize_doi(t), python_title(t), " +
        "name_similarity(t, t), simhash64(t), doc_fingerprint(t), " +
        "lang_id(t), token_count_bpeish(t), cosine_sim(v, v), " +
        "minhash_sig(t, 3, 8), word_shingles(t, 2), " +
        "winnow(t, 4, 3), winnow_positions(t, 4, 3), " +
        "repetition_stats(t, 2, '\\n'), deflate_len(t), " +
        "ac_find_phrases(t, 'quick\u0001fox\u0001quick\u0001brown cow'), " + // unsorted+dup: normalized inside
        "name_similarity_upper(t, t), " +
        "ac_mask_phrases(t, 'quick\u0001brown fox', '_'), " +
        "lcs_tokens(t, t), " +
        "ac_hit_positions(t, 'quick\u0001fox') " +
        "FROM codegen_probe").head()
    assert(row.size == 20)
    assert(row.getLong(18) == 5L) // LCS of a token sequence with itself
    assert(row.getSeq[String](15) == Seq("fox", "quick"))
    assert(row.getDouble(16) == 1.0)
    assert(row.getString(17) == "the _ _ jumps")
    val hits = row.getSeq[org.apache.spark.sql.Row](19)
      .map(h => (h.getInt(0), h.getString(1)))
    assert(hits == Seq((4, "quick"), (16, "fox")))
  }

  test("pure range condition (no equi keys) also rewrites") {
    import spark.implicits._
    val points = (0L until 100L).map(t => (t, t)).toDF("pid", "t")
    val intervals = Seq((1L, 10L, 40L), (2L, 35L, 36L), (3L, 90L, 250L))
      .toDF("iid", "lo", "hi")
    val joined = points.join(intervals,
      col("t") >= col("lo") && col("t") <= col("hi"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
    val n = joined.count()
    assert(n == 31 + 2 + 10) // [10,40], [35,36], [90,99]
  }
}
