package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation operators for training-data pipelines: deterministic
  * splits, stratified sampling, distribution-based filtering, and text
  * scrubbing. All are narrow or single-shuffle dataflows; every one is
  * deterministic (hash-driven, not RNG-driven) so runs are reproducible
  * and oracle-checkable — the property a 100 TB pipeline needs to make
  * retries and backfills idempotent.
  */
object CorpusOps {

  /** Deterministic train/val/test assignment from a stable key hash.
    * md5 (not an RNG) so membership is a pure function of the key: adding
    * or removing rows never reshuffles other rows' assignments — the
    * property that keeps incremental corpus refreshes leak-free.
    *
    * @param trainPct/valPct integer percents; test gets the remainder
    */
  def hashSplit(keyCol: String, trainPct: Int = 80,
                valPct: Int = 10): Column = {
    require(trainPct + valPct <= 100, "train+val must be <= 100")
    val bucket = conv(substring(md5(col(keyCol).cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic stratified downsample: keep a per-stratum fraction,
    * chosen by key hash (reproducible; no sampleBy RNG). ratePct is an
    * integer percent per stratum value; strata absent from the map keep
    * defaultPct.
    */
  def stratifiedKeep(keyCol: String, stratumCol: String,
                     ratePct: Map[String, Int], defaultPct: Int): Column = {
    val bucket = conv(substring(md5(col(keyCol).cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    val rate = ratePct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    bucket < rate
  }

  /** Exact within-stratum length-percentile band filter: keep rows whose
    * text length falls inside [lowPct, highPct] of the stratum's length
    * distribution (Gopher-style outlier trimming, exact rather than
    * approximate so the result is reproducible). One window shuffle per
    * stratum; at corpus scale use the approx-quantile variant per
    * partition of strata if a single stratum exceeds executor memory.
    */
  def lengthBand(df: DataFrame, textCol: String, stratumCol: String,
                 lowPct: Double, highPct: Double): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(length(col(textCol)))
    df.withColumn("_pr", percent_rank().over(w))
      .filter(col("_pr") >= lowPct && col("_pr") <= highPct)
      .drop("_pr")
  }

  /** PII-style scrub: redact email-like and long-digit-run tokens. Pure
    * codegen'd regexp (RE2-compatible patterns — no lookarounds — so the
    * same regexes run in other engines for cross-checking).
    */
  def scrubText(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(email, "[0-9]{9,}", "<NUM>")
  }

  /** Sequence packing: assign documents to fixed token-budget packs —
    * the "concatenate docs into ~budget-token training sequences" step.
    * Streaming-chunk semantics: docs are taken in deterministic id order
    * and a pack is the contiguous run whose EXCLUSIVE running token total
    * stays under the budget (a doc straddling the boundary starts in the
    * pack where its first token lands).
    *
    * Packing is sharded (`nShards` by id-hash) so the running-sum window
    * is partitioned — no global single-task sort — and each shard packs
    * independently (pack identity = (shard, local index)). Exclusive
    * cumsum + integer div keeps it SQL-reproducible.
    *
    * @return input + (shard, n_tokens, pack_id) with pack_id local to the
    *   shard
    */
  def packByTokenBudget(docs: DataFrame, budget: Long,
                        idCol: String = "doc_id", textCol: String = "text",
                        nShards: Int = 8,
                        shardBy: Option[Column] = None): DataFrame = {
    require(budget > 0 && nShards > 0)
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard",
        shardBy.getOrElse(pmod(xxhash64(col(idCol)), lit(nShards))))
      .withColumn("n_tokens",
        size(split(trim(col(textCol)), "\\s+")).cast("long"))
      .withColumn("_cum", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", expr(s"_cum div ${budget}L"))
      .drop("_cum")
  }
}
