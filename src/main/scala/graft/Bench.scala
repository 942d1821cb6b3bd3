package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query isn't charged for JIT
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => }
    // noop sink forces full evaluation of every column (a bare count() lets
    // Catalyst prune projections, under-measuring expression-heavy queries).
    // Each query runs twice and reports the min: the second pass amortizes
    // codegen/JIT and rides out transient host-contention spikes, so the
    // number approximates steady-state plan cost rather than luck-of-draw.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1 = ordered.map { case (n, fn) => n -> once(fn) }.toMap
    val results = ordered.map { case (n, fn) =>
      n -> math.min(pass1(n), once(fn))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
