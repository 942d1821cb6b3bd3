package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the dedup operators' DEGENERATE regime: replicate the
  * sf0.1 documents table `mult`× with remapped ids but IDENTICAL text, so
  * every doc (and every line, and every k-gram) is duplicated mult× — the
  * heavy-duplication corpus where the span operators' survivor set outgrows
  * the broadcast cap and must take the shuffled-join fallback, and where
  * line/minhash dedup hit maximal group sizes.
  *
  * Run by hand (not part of `sbt test` — it is a multi-minute probe):
  *   sbt "Test/runMain graft.ScaleProbe [mult] [sfDir]"
  * Prints one line per operator: name, mult, rows, seconds. Compare runs at
  * mult=1 vs mult=8: the times should scale ~linearly in corpus size (the
  * fallback join is linear; nothing quadratic, nothing OOMs).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(8)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val docs = (0 until mult)
      .map(i => base.withColumn("doc_id",
        col("doc_id") + lit(i.toLong * 10_000_000L)))
      .reduce(_ union _)
      .localCheckpoint(true)
    val n = docs.count()

    def probe(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-22s mult=$mult docs=$n time=$secs%.1fs")
    }

    // line dedup: every line duplicated mult x (and within-corpus repeats)
    probe("dedup_lines") {
      graft.ops.Dedup.dedupLines(docs.withColumn("text",
        regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n")))
    }
    // span trio in the survivor-heavy regime (k=60 grams, all duplicated)
    probe("duplicate_spans") {
      graft.ops.Dedup.duplicateSpans(docs, k = 60)
    }
    probe("span_ranges") {
      graft.ops.Dedup.duplicateSpanRanges(docs, k = 60)
    }
    probe("cut_spans") {
      graft.ops.Dedup.cutDuplicateSpans(docs, k = 60)
    }
    probe("minhash_lsh") {
      graft.ops.Dedup.minhashLsh(docs, threshold = 0.8)
    }
    // span decontamination with a pathologically LARGE "eval" set (the
    // replicated corpus itself): the eval gram table blows through the
    // broadcast cap, forcing the shuffled-equi-join fallback, and every
    // train gram matches — maximal cut volume
    probe("cut_contaminated") {
      graft.ops.Dedup.cutContaminatedSpans(docs, docs, k = 60)
    }
    spark.stop()
  }
}
