package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class PayloadSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("payload-source-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeDir(n: Int): String = {
    val dir = Files.createTempDirectory("payloads")
    (1 to n).foreach { i =>
      Files.writeString(dir.resolve(s"10.5281zenodo$i.json"),
        s"""{"results": [{"id": $i}], "note": "payload $i"}""")
    }
    Files.writeString(dir.resolve("ignored.txt"), "not json")
    dir.toString
  }

  test("graft-payload short name reads (file_key, payload) rows") {
    val dir = writeDir(7)
    val df = spark.read.format("graft-payload").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("file_key", "payload"))
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.size == 7) // .txt file ignored
    assert(rows("10.5281zenodo3").contains("\"id\": 3"))
  }

  test("planning splits files across tasks, not one task per file") {
    val dir = writeDir(20)
    val df = spark.read.format("graft-payload").load(dir)
    val parts = df.rdd.getNumPartitions
    assert(parts <= spark.sparkContext.defaultParallelism,
      s"expected size-balanced buckets, got $parts partitions")
    assert(df.count() == 20)
  }

  test("SQL DDL can mount the payload dir as a table") {
    val dir = writeDir(3)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW payloads_v " +
      s"USING `graft-payload` OPTIONS (path '$dir')")
    assert(spark.table("payloads_v").count() == 3)
  }

  test("feeds readPayloadDir-equivalent join back to DOIs") {
    import spark.implicits._
    val dir = writeDir(2)
    val payloads = spark.read.format("graft-payload").load(dir)
    val dois = Seq("10.5281/zenodo1", "10.5281/zenodo2", "10.5281/missing")
      .toDF("doi")
      .withColumn("file_key", regexp_replace(col("doi"), "/", ""))
    val joined = dois.join(payloads, Seq("file_key"))
    assert(joined.count() == 2)
  }
}
