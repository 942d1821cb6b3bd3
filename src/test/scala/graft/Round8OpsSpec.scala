package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch: sliding-anchor funnel (windowFunnel greedy mode),
  * dialog-level decontamination, and the round's staged-form seams
  * (minhashLsh numHashes = 0, annTopK/cosinePairs planes = 0).
  */
class Round8OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round8-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def evDf(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.map { case (u, t, e) => (u, ts(t), e) }
      .toDF("user_id", "ts", "event_type")
  }

  // ------------------------------------------------ sliding-anchor funnel

  test("funnelSliding: a late anchor completes where the earliest-anchored " +
      "funnel stalls (the planted deeper-reach stream)") {
    val steps = Seq("view", "click", "purchase")
    // earliest anchor view@0: click@5 chains, purchase@108 misses the
    // 10 s window -> stage 2; anchor view@100 chains click@104,
    // purchase@108 -> stage 3
    val events = evDf(
      (1L, 0L, "view"), (1L, 5L, "click"),
      (1L, 100L, "view"), (1L, 104L, "click"), (1L, 108L, "purchase"))
    val earliest = graft.ops.Sessions.funnel(events, steps, 10L).head()
    assert(earliest.getAs[Int]("stage") === 2)
    val sliding = graft.ops.Sessions
      .funnelSliding(events, steps, 10L).head()
    assert(sliding.getAs[Int]("stage") === 3)
    assert(sliding.getAs[Long]("anchor_us") === 100L * 1000000L,
      "the deepest chain's anchor is the late view")
  }

  test("funnelSliding: per-level state keeps the LATEST viable anchor " +
      "(a fresher anchor must not be shadowed by an older one)") {
    val steps = Seq("view", "click", "purchase")
    // view@0 -> click@9 (within 10) sets level 2 with anchor 0; view@8
    // -> click@9 refreshes level 2's anchor to 8; purchase@17 is outside
    // anchor 0's window but inside anchor 8's
    val events = evDf(
      (1L, 0L, "view"), (1L, 8L, "view"), (1L, 9L, "click"),
      (1L, 17L, "purchase"))
    val r = graft.ops.Sessions.funnelSliding(events, steps, 10L).head()
    assert(r.getAs[Int]("stage") === 3)
    assert(r.getAs[Long]("anchor_us") === 8L * 1000000L)
  }

  test("funnelSliding: equal timestamps chain in step order (at-or-after); " +
      "users without step 1 emit nothing") {
    val steps = Seq("view", "click")
    val events = evDf(
      (1L, 5L, "view"), (1L, 5L, "click"), // same instant: chains
      (2L, 5L, "click")) // no anchor
    val out = graft.ops.Sessions.funnelSliding(events, steps, 10L).collect()
    assert(out.length === 1 && out.head.getAs[Long]("user_id") === 1L)
    assert(out.head.getAs[Int]("stage") === 2)
  }

  test("funnelSliding dominates funnel on every user of a generated stream") {
    import spark.implicits._
    val steps = Seq("view", "click", "purchase")
    // deterministic pseudo-random stream: 40 users x 30 events
    val rows = for {
      u <- 0L until 40L
      i <- 0 until 30
      h = ((u * 31 + i) * 2654435761L) >>> 7
    } yield (u, (h % 1000L), Seq("view", "click", "purchase", "error")(
      ((h >>> 12) % 4L).toInt))
    val events = evDf(rows: _*)
    val slide = graft.ops.Sessions.funnelSliding(events, steps, 60L)
      .select(col("user_id"), col("stage").as("s_slide"))
    val early = graft.ops.Sessions.funnel(events, steps, 60L)
      .select(col("user_id"), col("stage").as("s_early"))
    val joined = slide.join(early, Seq("user_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Int]("s_slide") >= r.getAs[Int]("s_early"),
        s"sliding must reach at least as deep (user ${r.get(0)})")
    }
    // both forms agree on who entered the funnel at all
    assert(slide.count() === early.count())
  }

  test("funnelSliding: the maxEventsPerUser cap raises, never truncates") {
    val steps = Seq("view", "click")
    val events = evDf((1L, 0L, "view"), (1L, 1L, "view"), (1L, 2L, "click"))
    val ex = intercept[Exception] {
      graft.ops.Sessions.funnelSliding(events, steps, 10L,
        maxEventsPerUser = 2).collect()
    }
    assert(ex.getMessage != null)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxEventsPerUser")),
      s"cap violation must surface its own message, got: ${messages(ex)}")
    // events of non-step types never count against the cap
    val padded = evDf((1L, 0L, "view"), (1L, 1L, "error"), (1L, 2L, "error"),
      (1L, 3L, "click"))
    val ok = graft.ops.Sessions.funnelSliding(padded, steps, 10L,
      maxEventsPerUser = 2).head()
    assert(ok.getAs[Int]("stage") === 2)
  }

  test("funnelSliding rejects repeated step types") {
    val events = evDf((1L, 0L, "view"))
    intercept[IllegalArgumentException] {
      graft.ops.Sessions.funnelSliding(events, Seq("view", "view"), 10L)
    }
  }

  // --------------------------------------------- dialog decontamination

  private def dialogDf(rows: (Long, Seq[(String, String)])*) = {
    import spark.implicits._
    rows.toDF("dialog_id", "_t")
      .select(col("dialog_id"),
        transform(col("_t"), t =>
          struct(t.getField("_1").as("role"), t.getField("_2").as("content")))
          .as("turns"))
  }

  test("decontaminateDialogs: a leaked eval passage is caught in ANY turn; " +
      "clean dialogs pass") {
    import spark.implicits._
    val leak = "the seven keys of the cellar door were never found again"
    val dialogs = dialogDf(
      (1L, Seq("user" -> "tell me a story", "assistant" -> leak)),
      (2L, Seq("user" -> leak, "assistant" -> "certainly, anything else")),
      (3L, Seq("user" -> "what is two plus two",
        "assistant" -> "two plus two makes four")))
    val eval = Seq((100L, leak)).toDF("doc_id", "text")
    val out = graft.ops.DialogOps.decontaminateDialogs(dialogs, eval)
      .collect()
    assert(out.map(_.getAs[Long]("train_id")).sorted.toSeq === Seq(1L, 2L),
      "both the assistant-turn and the user-turn leak must flag; the " +
        "clean dialog must not")
    // the leak is 11 words = 9 distinct 3-grams; the turn-boundary fusion
    // eats at most the first one (role tag glued to the first word)
    out.foreach { r =>
      assert(r.getAs[Long]("n_shared") >= 8L &&
        r.getAs[Long]("n_shared") <= 9L, r.toString)
      assert(r.getAs[Long]("eval_id") === 100L)
    }
  }

  test("decontaminateDialogs: below-threshold overlap does not flag; " +
      "anti-join cleans") {
    import spark.implicits._
    // "pad" keeps the shared gram off the turn's first word (that word
    // fuses with the role tag — the documented boundary perturbation)
    val dialogs = dialogDf(
      (1L, Seq("user" -> "pad alpha beta gamma delta", // one shared 3-gram
        "assistant" -> "unrelated words entirely here")))
    val eval = Seq((7L, "alpha beta gamma nothing else matches"))
      .toDF("doc_id", "text")
    assert(graft.ops.DialogOps.decontaminateDialogs(dialogs, eval)
      .count() === 0L)
    val hits = graft.ops.DialogOps.decontaminateDialogs(
      dialogs, eval, minSharedShingles = 1)
    assert(hits.count() === 1L, "min-shared 1 admits the single 3-gram")
    assert(dialogs.join(hits.select(col("train_id").as("dialog_id")),
      Seq("dialog_id"), "left_anti").count() === 0L)
  }

  // --------------------------------------------------- staged-form seams

  test("minhashLsh numHashes=0/bands=1 equals exact all-pairs " +
      "shingle-Jaccard (the staged identity)") {
    import spark.implicits._
    import graft.functions.CorpusFunctions.jaccard_char_shingles
    val docs = (0L until 24L).map { i =>
      val base = "the quick brown fox jumps over the lazy dog once more"
      (i, if (i % 3 == 0) base else base + s" variant ${i % 7} tail ${i % 5}")
    }.toDF("doc_id", "text")
    val staged = graft.ops.Dedup.minhashLsh(docs, threshold = 0.5,
      numHashes = 0, bands = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = docs.select(col("doc_id").as("id_a"), col("text").as("_ta"))
    val b = docs.select(col("doc_id").as("id_b"), col("text").as("_tb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(jaccard_char_shingles(col("_ta"), col("_tb"), 5) >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(staged.sorted.toSeq === exact.sorted.toSeq)
    assert(exact.nonEmpty, "the fixture must produce pairs")
  }

  test("annTopK planes=0/bands=1 equals bruteForceTopK (the staged identity)") {
    import spark.implicits._
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(j =>
        math.sin(i * 1.7 + j * 0.9).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val staged = graft.ops.Similarity.annTopK(q, vecs, k = 5,
      planes = 0, bands = 1)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val brute = graft.ops.Similarity.bruteForceTopK(q, vecs, k = 5)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(staged === brute)
  }
}
