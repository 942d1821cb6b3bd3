package graft

import graft.ops.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("layout-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** reference Morton interleave over pre-bucketed ordinals */
  private def morton(ords: Seq[Long], bits: Int): Long = {
    val k = ords.size
    (0 until bits).foldLeft(0L) { (acc, b) =>
      ords.zipWithIndex.foldLeft(acc) { case (a, (o, i)) =>
        a | (((o >> b) & 1L) << (b * k + i))
      }
    }
  }

  test("zorderKey matches the reference interleave") {
    import spark.implicits._
    val n = 64
    val df = (for (x <- 0 until n; y <- 0 until n) yield (x, y))
      .toDF("x", "y")
    val got = df.withColumn("z", Layout.zorderKey(
      Seq((col("x"), 0.0, n.toDouble), (col("y"), 0.0, n.toDouble)), bits = 6))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (x <- Seq(0, 3, 31, 63); y <- Seq(0, 5, 32, 63))
      assert(got((x, y)) == morton(Seq(x.toLong, y.toLong), 6),
        s"mismatch at ($x,$y)")
  }

  test("z-ordered chunks have bounded extents in BOTH dimensions") {
    import spark.implicits._
    val n = 64
    val df = (for (x <- 0 until n; y <- 0 until n) yield (x, y))
      .toDF("x", "y")
    val sorted = df.withColumn("z", Layout.zorderKey(
      Seq((col("x"), 0.0, n.toDouble), (col("y"), 0.0, n.toDouble)), bits = 6))
      .orderBy("z").collect().map(r => (r.getInt(0), r.getInt(1)))
    // 8 contiguous key-range chunks = the boxes a range-partitioned write
    // would produce; a lexicographic (x, y) sort would give y-extent = 64
    // for every chunk — z-order must bound BOTH extents at n/2
    for (chunk <- sorted.grouped(n * n / 8)) {
      val xs = chunk.map(_._1); val ys = chunk.map(_._2)
      assert(xs.max - xs.min < n / 2 + 1, "x extent too wide")
      assert(ys.max - ys.min < n / 2 + 1, "y extent too wide")
    }
  }

  test("writeZordered round-trips the data across the requested files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y))
      .toDF("x", "y")
    Layout.writeZordered(df, s"$dir/t",
      Seq(("x", 0.0, 32.0), ("y", 0.0, 32.0)), numFiles = 4, bits = 5)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 32 * 32)
    assert(back.columns.toSet == Set("x", "y")) // key column dropped
    val nFiles = back.select(input_file_name().as("f")).distinct().count()
    assert(nFiles == 4)
  }

  test("writeRangeSharded produces disjoint, internally sorted shards") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val rnd = new scala.util.Random(3)
    val df = (1 to 5000).map(_ => (rnd.nextInt(100000), rnd.nextInt(10)))
      .toDF("key", "payload")
    Layout.writeRangeSharded(df, s"$dir/t", Seq("key"), numShards = 6)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 5000)
    // per-file extent: files must not overlap on key, and each must be
    // internally sorted (monotonic when read in file order)
    val perFile = back
      .select(input_file_name().as("f"), col("key"))
      .groupBy("f").agg(min("key").as("lo"), max("key").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .sortBy(_._2)
    assert(perFile.length == 6)
    perFile.sliding(2).foreach {
      case Array((_, _, hiA), (_, loB, _)) => assert(hiA <= loB,
        s"shard ranges overlap: $hiA > $loB")
      case _ =>
    }
    // internal order: within every file the key sequence is non-decreasing
    val unsorted = back
      .select(input_file_name().as("f"), col("key"))
      .withColumn("_prev", lag("key", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(monotonically_increasing_id())))
      .filter(col("_prev") > col("key"))
      .count()
    assert(unsorted == 0)
  }
}
