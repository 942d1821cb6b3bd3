package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Queries whose DEFINITION changed in a past round — what they
    * measure is discontinuous across artifacts, so cross-round deltas on
    * them are apples-to-oranges, not regressions/speedups. Emitted in
    * the artifact (`"discontinuities"`) and consumed by
    * tools/bench_compare.py, which reports them separately instead of
    * flagging them. Keep entries until the change has an artifact on
    * BOTH sides of every comparison anyone still runs (2+ rounds).
    */
  val DISCONTINUITIES: Map[String, String] = Map(
    "q_pca_project" -> "r9: measures projection only (fit moved to spec coverage)",
    "q_dedup_simhash" -> "r9: md5 certification seam replaced the murmur word hash (~10x hash cost)",
    "q_dup_spans_winnow" -> "r9: md5 gram-hash seam replaced murmur",
    "q_wordpiece_encode" -> "r9: topWords 200 -> 10",
    "q_sketch_distinct" -> "r9: KMV exact-below-k swapped in for HLL",
    "q_dedup_minhash" -> "r10: md5 shingle seam replaced the murmur shingle hash",
    "q_dedup_minhash_clusters" -> "r10: md5 shingle seam",
    "q_dedup_minhash_incr" -> "r10: md5 shingle seam",
    "q_split_leakage" -> "r10: md5 shingle seam",
    "q_decontaminate_dialogs" -> "r10: md5 word-gram seam replaced the murmur word-shingle hash",
    "q_ivf_drift" -> "r10: new query",
    "q_ann_ivf_split" -> "r10: new query",
    "q_bm25_drift" -> "r10: new query",
    "q_ann_ivf_compact" -> "r11: new query",
    "q_bm25_compact" -> "r11: new query",
    "q_nsw_drift" -> "r11: new query",
    "q_ann_ivfq_split" -> "r11: new query",
    "q_ivfpq_compact" -> "r11: new query",
    "q_dedup_minhash_prod" -> "r11: new bench-only production twin (murmur, deployment banding)",
    "q_dedup_minhash_incr_prod" -> "r11: new bench-only production twin",
    "q_dedup_simhash_prod" -> "r11: new bench-only production twin",
    "q_dup_spans_winnow_prod" -> "r11: new bench-only production twin",
    "q_split_leakage_prod" -> "r11: new bench-only production twin",
    "q_decontaminate_dialogs_prod" -> "r11: new bench-only production twin")

  /** Timed best-of-N over a query map through the noop sink. Returns
    * (per-query min seconds, per-query error) — errors are RECORDED, not
    * swallowed: a failing query must show up as `err` in the artifact
    * rather than as a suspiciously fast time.
    */
  def run(queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
          spark: SparkSession, sfDir: String,
          passes: Int): (Seq[(String, Double)], Map[String, String]) = {
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    var leaked = 0L
    def once(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").takeWhile(_ != '\n').take(200)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      // Post-timing hygiene, OUTSIDE the timed region: a query whose
      // returned frame depends on pinned (localCheckpointed) state cannot
      // release the pin before the sink consumes it, so without this the
      // block manager accumulates every query's dead pins for the whole
      // session (~260 dead RDDs per full pass measured at sf0.1) and late
      // queries pay the memory/GC pressure of early ones. Pins reachable
      // from SparkEntry's session-lifetime caches (the build-once/
      // probe-many index and tokenizer artifacts, whose builds are timed
      // as their own queries) are protected — unpersisting those would
      // truncate checkpointed lineage for every later probe query. Dead
      // pins are unreachable by anything that runs later (each invocation
      // builds fresh frames from the parquet inputs), so this only
      // removes inter-query interference; it caches nothing, skips
      // nothing, and precomputes nothing.
      val live = SparkEntry.livePinRddIds(spark)
      val dead = spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => live(id) }
      if (dead.nonEmpty) {
        leaked += dead.size
        dead.values.foreach(_.unpersist(blocking = false))
      }
      secs
    }
    val ordered = queries.toSeq.sortBy(_._1)
    val perPass = (1 to passes).map { _ =>
      ordered.map { case (n, fn) => n -> once(n, fn) }.toMap
    }
    System.err.println(
      s"bench hygiene: released $leaked dead pin RDDs (cache-reachable pins protected)")
    (ordered.map { case (n, _) => n -> perPass.map(_(n)).min },
      errors.toMap)
  }

  def main(args: Array[String]): Unit = {
    val jvmStart = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getStartTime
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the default 100-entry codegen class cache evicts constantly
      // under a 250+-query suite (each query compiles dozens of codegen
      // units), so every pass re-pays Janino compilation; scale-free
      // JVM-level setting (a long-lived production driver wants it too)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query isn't charged for JIT
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => }
    // noop sink forces full evaluation of every column (a bare count() lets
    // Catalyst prune projections, under-measuring expression-heavy queries).
    // Best-of-`passes` (default 3): later passes amortize codegen/JIT and
    // ride out transient host-contention spikes, approximating steady-state
    // plan cost rather than luck-of-draw.
    // optional args: bench only the named queries (dev iteration; the
    // driver harness always invokes with no args = full suite).
    // benchOnly = production-parameter twins of the seam-converted
    // queries: benched for regression tracking, never oracled (murmur
    // hashes have no SQL replay — Verify skips them by construction)
    val all = SparkEntry.queries ++ SparkEntry.benchOnly
    val only = args.toSet
    val selected =
      if (only.isEmpty) all
      else all.filter { case (k, _) => only(k) }
    val (results, errors) = run(selected, spark, sfDir, passes)
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v) =>
      if (errors.contains(k)) s"${jstr(k)}:{\"err\":${jstr(errors(k))}}"
      else s"${jstr(k)}:$v"
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !errors.contains(k) => v }.sum
    // wall seconds since JVM start: a contended host shows wall >> measured
    val wall = (System.currentTimeMillis() - jvmStart) / 1e3
    val disc = DISCONTINUITIES.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"n_errors":${errors.size},"jvm_wall_sec":$wall,"discontinuities":$disc}"""
    println(line)
    // the driver's BENCH_r{N}.json keeps only a tail of this (long) line,
    // so cross-round regression tracking would cover a fraction of the
    // suite; SPARK_GRAFT_BENCH_OUT writes the COMPLETE artifact to a file
    // (committed per round as BENCH_LOCAL_r{N}.json for
    // tools/bench_compare.py, which consumes either form)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      // never let a bad output path lose the run: the measurements are
      // already on stdout and the compact summary must still print LAST
      try {
        val path = java.nio.file.Paths.get(p)
        Option(path.getParent)
          .foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(path, (line + "\n").getBytes("UTF-8"))
      } catch {
        case e: Exception =>
          System.err.println(s"BENCH_OUT write failed ($p): $e")
      }
    }
    // compact summary LAST: a tail-truncated capture of the (long) line
    // above still keeps the headline numbers in the final ~200 bytes
    println(s"""{"metric":"summary","total_sec":${math.round(total * 1000) / 1000.0},"n_queries":${results.size},"n_errors":${errors.size},"jvm_wall_sec":$wall}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
