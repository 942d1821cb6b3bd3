package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 batch 6: Aho–Corasick occurrence evidence (ac_hit_positions)
  * and the KWIC concordance built on it. Positions are pinned against a
  * brute-force substring scan (the same oracle shape q_kwic uses).
  */
class Round7fOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round7f-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def bruteHits(text: String, phrases: Seq[String]): Seq[(Int, String)] =
    (for {
      p <- phrases.distinct.sorted if p.nonEmpty
      i <- 0 to text.length - p.length if text.regionMatches(i, p, 0, p.length)
    } yield (i, p)).sortBy(_._1)

  test("hitPositions: overlapping and nested matches, all offsets, " +
      "brute-force parity") {
    val ac = new graft.functions.AhoCorasick(
      Array("ab", "b", "aba", "zz"))
    val got = ac.hitPositions("abab").array.toSeq
      .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      .map(r => (r.getInt(0), r.getUTF8String(1).toString))
    val want = bruteHits("abab", Seq("ab", "b", "aba", "zz"))
    assert(got.sorted === want.sorted,
      s"AC must report every occurrence: got $got want $want")
    // self-overlap: "aa" in "aaaa" at 0,1,2
    val ac2 = new graft.functions.AhoCorasick(Array("aa"))
    val got2 = ac2.hitPositions("aaaa").array.toSeq
      .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      .map(_.getInt(0))
    assert(got2 === Seq(0, 1, 2))
    // empty pattern contributes no positions
    val ac3 = new graft.functions.AhoCorasick(Array("", "x"))
    assert(ac3.hitPositions("axa").numElements() === 1)
  }

  test("kwicWindows: contexts clamp at document edges; offsets 0-based") {
    import spark.implicits._
    val docs = Seq((1L, "fox at start and fox at the very end fox"),
      (2L, "no hits here"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.kwicWindows(docs, Seq("fox"),
      window = 5).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getString(3), r.getString(4)))
      .sortBy(_._2)
    assert(out.length === 3)
    assert(out(0) === ((1L, 0, "", " at s")), "left context empty at 0")
    assert(out(1) === ((1L, 17, " and ", " at t")))
    assert(out(2) === ((1L, 37, " end ", "")), "right context empty at EOF")
  }
}
