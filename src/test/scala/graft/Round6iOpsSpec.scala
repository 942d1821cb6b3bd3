package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 11: UniMax allocation, contamination report, byte-level
  * BPE, curateCorpus soft-dedup mode.
  */
class Round6iOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round6i-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // --- unimaxAllocate ------------------------------------------------------

  private def alloc(sizes: Seq[(String, Long)], budget: Long,
                    maxEpochs: Int): Map[String, Long] = {
    import spark.implicits._
    graft.ops.CorpusOps.unimaxAllocate(
        sizes.toDF("source", "n_tokens"), budget, maxEpochs)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
  }

  test("unimaxAllocate: hand-computed waterfill — mixed saturation, " +
      "all-saturate, even-split, integer slack") {
    val sizes = Seq(("a", 10L), ("b", 100L), ("c", 1000L))
    // caps 20/200/2000; budget 1000: a,b saturate, c takes the rest
    assert(alloc(sizes, 1000L, 2) ==
      Map("a" -> 20L, "b" -> 200L, "c" -> 780L))
    // budget >= total caps: everyone saturates (2220 total)
    assert(alloc(sizes, 10000L, 2) ==
      Map("a" -> 20L, "b" -> 200L, "c" -> 2000L))
    // budget 60: level 20 == cap(a) -> a saturates, b and c level at 20
    assert(alloc(sizes, 60L, 2) ==
      Map("a" -> 20L, "b" -> 20L, "c" -> 20L))
    // integer slack: budget 61 allocates 60 (floor), never over-allocates
    val a61 = alloc(sizes, 61L, 2)
    assert(a61.values.sum == 60L && a61 ==
      Map("a" -> 20L, "b" -> 20L, "c" -> 20L))
    // guards
    intercept[IllegalArgumentException] { alloc(sizes, 0L, 2) }
    intercept[IllegalArgumentException] { alloc(sizes, 10L, 0) }
  }

  test("unimaxAllocate: total never exceeds budget over randomized inputs, " +
      "quotas never exceed caps, small sources covered first") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 20) {
      val sizes = (1 to 1 + rnd.nextInt(12))
        .map(i => (s"s$i", rnd.nextInt(5000).toLong))
      val budget = 1L + rnd.nextInt(30000)
      val out = alloc(sizes, budget, 3)
      val caps = sizes.map { case (s, n) => s -> n * 3 }.toMap
      assert(out.values.sum <= math.min(budget, caps.values.sum))
      assert(out.forall { case (s, q) => q <= caps(s) })
      // uniformity: any unsaturated source's quota >= any other's
      // saturated cap is NOT required, but all unsaturated quotas equal
      val unsat = out.filter { case (s, q) => q < caps(s) }.values.toSet
      assert(unsat.size <= 1, s"unsaturated levels differ: $unsat")
    }
  }

  // --- contaminationReport -------------------------------------------------

  test("contaminationReport: planted pairs aggregate per set; zero-hit " +
      "set still reports") {
    import spark.implicits._
    val pairs = Seq((101L, 1L, 3L), (102L, 1L, 2L), (103L, 2L, 5L))
      .toDF("train_id", "eval_id", "n_shared")
    val evals = Seq((1L, "mmlu"), (2L, "mmlu"), (3L, "mmlu"),
      (4L, "gsm8k")).toDF("doc_id", "eval_set")
    val got = graft.ops.Dedup.contaminationReport(pairs, evals)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq(("gsm8k", 1L, 0L, 0L, 0L),
      ("mmlu", 3L, 2L, 3L, 3L)))
    // a NULL set label is a real label: its hits must NOT be zeroed by
    // a null-dropping equi-join
    val evalsN = Seq((1L, Some("mmlu")), (2L, Option.empty[String]))
      .toDF("doc_id", "eval_set")
    val pairsN = Seq((100L, 2L, 4L)).toDF("train_id", "eval_id", "n_shared")
    val gotN = graft.ops.Dedup.contaminationReport(pairsN, evalsN)
      .collect().map(r => (Option(r.getString(0)), r.getLong(4))).toMap
    assert(gotN == Map(Some("mmlu") -> 0L, None -> 1L))
  }

  // --- byte-level BPE ------------------------------------------------------

  test("toByteLevel: GPT-2 table goldens — ASCII printable identity, " +
      "space -> U+0120, multi-byte expansion") {
    import graft.ops.Tokenize
    assert(Tokenize.toByteLevel("abc") == "abc")
    assert(Tokenize.toByteLevel(" ") == "Ġ") // the famous 'Ġ'
    assert(Tokenize.toByteLevel("é") == "Ã©")     // C3 A9, both printable
    assert(Tokenize.toByteLevel("\n") == "Ċ") // byte 10 -> 256+10
    // injectivity over all single bytes
    assert((0 until 256).map(b =>
      Tokenize.byteToUnicode(b)).distinct.size == 256)
  }

  test("byte BPE: 0-merge n_tokens == UTF-8 byte count of non-space " +
      "words; trained merges compress; encode is deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa aa bb"), (2L, "héllo héllo"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val zero = graft.ops.Tokenize.encodeByteBpe(docs, Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // "aa aa aa bb": 8 non-space chars, all 1-byte; "héllo héllo":
    // 10 chars of which é is 2 bytes -> 12 bytes
    assert(zero == Map(1L -> 8, 2L -> 12, 3L -> 0))
    val merges = graft.ops.Tokenize.trainByteBpe(docs, numMerges = 2)
    assert(merges.nonEmpty)
    val enc = graft.ops.Tokenize.encodeByteBpe(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(enc(1L) < zero(1L)) // "aa" merges
    val enc2 = graft.ops.Tokenize.encodeByteBpe(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(enc2 == enc)
  }

  // --- exactUniform + curateCorpus uniformCanonical mode -------------------

  test("exactUniform: exactly one survivor per group, the min-md5 member " +
      "(not the min id); null ids never NULL the flag") {
    import spark.implicits._
    val docs = ((1L to 30L).map(i => (Some(i), "same text")) ++
      Seq((Some(31L), "other text"), (Option.empty[Long], "third text")))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.exactUniform(docs).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(2), r.isNullAt(3), r.getBoolean(3)))
    assert(out.forall(!_._3)) // the flag is never NULL, even for null ids
    // md5-uniform winner of ids 1..30 is 27 (precomputed), NOT id 1; the
    // null-id singleton is its own canonical via the null-safe compare
    assert(out.filter(_._4).map(_._1).toSet == Set(27L, 31L, -1L))
    assert(out.filter(_._1 > 0).forall(t =>
      t._2 == (if (t._1 == 31L) 1L else 30L)))
  }

  test("curateCorpus uniformCanonical mode: exactly one hash-chosen " +
      "survivor per exact-dup group, deterministic, stage reported") {
    import spark.implicits._
    // 30 copies of one doc + 10 uniques, all passing the quality gates
    val text = "the quick brown fox jumps over the lazy dog and then " +
      "the cat sat on the mat while it was raining outside today"
    val docs = ((1L to 30L).map(i => (i, text + " copy", "en", "s1")) ++
      (31L to 40L).map(i =>
        (i, text + s" unique tail number $i", "en", "s2")))
      .toDF("doc_id", "text", "lang", "source")
    val eval = Seq((9999L, "completely unrelated benchmark words"))
      .toDF("doc_id", "text")
    val soft = graft.ops.Pipelines.curateCorpus(docs, eval,
      minQuality = 0.0, maxRepetition = 1.0, nearDupThreshold = 0.99,
      uniformCanonical = true)
    val softIds = soft.chunks.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    // the 30-dup group keeps exactly its md5-uniform winner, id 27 —
    // single-survivor semantics compose with the near-dup stage instead
    // of being re-collapsed to min id by it
    assert(softIds.filter(_ <= 30) == Set(27L), s"got $softIds")
    assert(soft.report.filter(col("stage") === "exact-dedup").count() == 1)
    // determinism
    val soft2 = graft.ops.Pipelines.curateCorpus(docs, eval,
      minQuality = 0.0, maxRepetition = 1.0, nearDupThreshold = 0.99,
      uniformCanonical = true)
    assert(soft2.chunks.select("doc_id").collect()
      .map(_.getLong(0)).toSet == softIds)
  }
}
