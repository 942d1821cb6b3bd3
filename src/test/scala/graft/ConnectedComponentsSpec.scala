package graft

import graft.graph.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("cc-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // threshold 0 forces the distributed alternating-star loop; the default
  // routes these toy graphs through the single-task union-find backend —
  // tests below assert the two agree
  private def cc(vs: Seq[Long], es: Seq[(Long, Long)],
                 smallThreshold: Long = 2000000L): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(vs.toDF("id"), es.toDF("src", "dst"),
      smallGraphThreshold = smallThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** reference union-find for cross-checking */
  private def expected(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vs.map(v => v -> v): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    vs.map(v => v -> find(v)).toMap
  }

  test("path graph (worst case for min-label propagation)") {
    val vs = (1L to 40L)
    val es = vs.init.map(i => (i, i + 1))
    assert(cc(vs, es) == vs.map(_ -> 1L).toMap)
    assert(cc(vs, es, smallThreshold = 0L) == vs.map(_ -> 1L).toMap)
  }

  test("star graph converges fast") {
    val vs = (1L to 100L)
    val es = (2L to 100L).map(i => (i, 1L))
    assert(cc(vs, es) == vs.map(_ -> 1L).toMap)
  }

  test("isolated vertices label themselves; multiple components") {
    val vs = Seq(1L, 2L, 3L, 10L, 11L, 20L)
    val es = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    assert(cc(vs, es) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("self-loops and duplicate/reversed edges ignored") {
    val vs = Seq(1L, 2L, 3L)
    val es = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L))
    assert(cc(vs, es) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty edge set") {
    val vs = Seq(5L, 6L)
    assert(cc(vs, Seq.empty) == Map(5L -> 5L, 6L -> 6L))
  }

  test("random graphs match union-find on BOTH backends") {
    val rnd = new Random(42)
    for (_ <- 1 to 3) {
      val n = 200
      val vs = (1L to n.toLong)
      val es = Seq.fill(150)((rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L))
        .filter { case (a, b) => a != b }
      val want = expected(vs, es)
      assert(cc(vs, es) == want)
      assert(cc(vs, es, smallThreshold = 0L) == want)
    }
  }

  test("empty edge set routes through the loop path too") {
    assert(cc(Seq(5L, 6L), Seq.empty, smallThreshold = -1L) ==
      Map(5L -> 5L, 6L -> 6L))
  }
}
