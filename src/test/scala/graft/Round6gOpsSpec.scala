package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 9: median/MAD outliers, quantile binning (the RAG
  * composition query is oracle-certified end-to-end in the contract).
  */
class Round6gOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round6g-ops").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.ops.CorpusOps

  test("madOutliers: hand-computed median/MAD; robust to the outlier " +
      "itself; null value -> null flag") {
    import spark.implicits._
    // values 10,12,14,16,1000: med=14, |x-med|=4,2,0,2,986 -> mad=2
    // outliers at k=3: |x-14| > 6 -> only 1000. Runs on the DEFAULT
    // (GK sketch) path — odd counts make the sketch medians exact, so
    // this golden pins the scale-safe default's values.
    val df = Seq(Some(10.0), Some(12.0), Some(14.0), Some(16.0),
      Some(1000.0), None).map(Tuple1(_)).toDF("v")
    val out = CorpusOps.madOutliers(df, "v", k = 3.0).collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Double]),
        r.getDouble(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Boolean])))
    assert(out.forall(t => t._2 == 14.0 && t._3 == 2.0),
      out.mkString(", ")) // percentile ignores the null row: 5 values
    val flags = out.map(t => t._1 -> t._4).toMap
    assert(flags(Some(1000.0)) == Some(true))
    assert(flags(Some(10.0)) == Some(false))
    assert(flags(None) == None) // null passes through unflagged
  }

  test("quantileBins: quartile goldens, boundary lands low, null bin, " +
      "reserved-column guard") {
    import spark.implicits._
    val df = (1 to 8).map(i => Some(i.toDouble)).:+(None)
      .map(Tuple1(_)).toDF("v")
    val out = CorpusOps.quantileBins(df, "v", k = 4, exact = true).collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]) ->
        Option(r.get(1)).map(_.asInstanceOf[Int])).toMap
    // cuts at 0.25/0.5/0.75 of 1..8 = 2.75, 4.5, 6.25
    assert(out(Some(1.0)) == Some(0) && out(Some(3.0)) == Some(1))
    assert(out(Some(5.0)) == Some(2) && out(Some(8.0)) == Some(3))
    assert(out(None) == None)
    intercept[IllegalArgumentException] {
      CorpusOps.quantileBins(df.withColumn("bin", lit(1)), "v", 4)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.madOutliers(df.withColumn("mad", lit(1)), "v")
    }
  }
}
