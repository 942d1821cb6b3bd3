package graft

import graft.functions.KmvSample.kmv_sample
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** KMV bottom-k sampler: exactness vs a reference sort, partition-order
  * independence (the property RNG reservoirs lack), set semantics on
  * repeated values, and md5 parity with the SQL oracle's hash.
  */
class KmvSampleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .appName("kmv-sample-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("returns the k distinct minima by md5, sorted, with priorities") {
    import spark.implicits._
    val values = (1 to 100).map(i => s"v$i")
    val df = values.toDF("v")
    val got = df.agg(kmv_sample(col("v"), 10).as("s"))
      .selectExpr("explode(s) AS e").select("e.item", "e.priority")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = values.map(v => (md5Hex(v), v)).sorted.take(10)
      .map { case (p, v) => (v, p) }
    assert(got.toSeq == expected)
  }

  test("partition-order independent and duplicate-insensitive") {
    import spark.implicits._
    val values = (1 to 50).map(i => s"doc$i")
    // duplicates + different partitioning must not change the sample
    val a = values.toDF("v").repartition(1)
      .agg(kmv_sample(col("v"), 7)).collect().head.toString
    val b = (values ++ values ++ values).toDF("v").repartition(13)
      .agg(kmv_sample(col("v"), 7)).collect().head.toString
    assert(a == b)
  }

  test("grouped: k per group, groups independent; SQL surface works") {
    import spark.implicits._
    val df = (1 to 60).map(i => (s"g${i % 3}", s"item$i")).toDF("g", "v")
    df.createOrReplaceTempView("kmv_in")
    val rows = spark.sql(
      "SELECT g, kmv_sample(v, 5) AS s FROM kmv_in GROUP BY g").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val g = r.getString(0)
      val arr = r.getSeq[Row](1)
      assert(arr.length == 5)
      // every sampled item belongs to its group and priorities ascend
      val prios = arr.map(_.getString(1))
      assert(prios == prios.sorted)
      arr.foreach { e =>
        val item = e.getString(0)
        assert((item.drop(4).toInt % 3) == g.drop(1).toInt)
        assert(e.getString(1) == md5Hex(item))
      }
    }
  }

  test("groups smaller than k return all values; nulls are skipped") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("b"), None).toDF("v")
    val arr = df.agg(kmv_sample(col("v"), 10)).collect().head.getSeq[Row](0)
    assert(arr.map(_.getString(0)).toSet == Set("a", "b"))
  }
}
