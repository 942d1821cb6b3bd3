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

  // --- curateCorpus soft-dedup mode ---------------------------------------

  test("curateCorpus softDedup mode: exact-dup groups keep ~1 expected " +
      "member (not necessarily the min id), report stage present") {
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
      softDedup = true)
    val softIds = soft.chunks.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    // every unique survives the exact stage; the 30-dup group keeps
    // few (deterministic md5 lattice, E=1; near-dup may trim further)
    val dupSurvivors = softIds.count(_ <= 30)
    assert(dupSurvivors <= 4, s"soft dedup kept $dupSurvivors of 30 dups")
    assert(soft.report.filter(col("stage") === "exact-dedup").count() == 1)
    // determinism
    val soft2 = graft.ops.Pipelines.curateCorpus(docs, eval,
      minQuality = 0.0, maxRepetition = 1.0, nearDupThreshold = 0.99,
      softDedup = true)
    assert(soft2.chunks.select("doc_id").collect()
      .map(_.getLong(0)).toSet == softIds)
  }
}
