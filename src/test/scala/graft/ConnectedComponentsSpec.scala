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

  private def cc(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(vs.toDF("id"), es.toDF("src", "dst"))
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

  test("random graphs match union-find") {
    val rnd = new Random(42)
    for (_ <- 1 to 3) {
      val n = 200
      val vs = (1L to n.toLong)
      val es = Seq.fill(150)((rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L))
        .filter { case (a, b) => a != b }
      assert(cc(vs, es) == expected(vs, es))
    }
  }
}
