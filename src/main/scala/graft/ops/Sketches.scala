package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch / approximate-aggregate operators — the summary layer a 100 TB
  * corpus pipeline reports from without re-scanning raw data.
  *
  * Everything here is a built-in codegen'd aggregate (DataSketches HLL,
  * GK percentile summaries) or a plain two-stage exact aggregation; all
  * are mergeable map-side-partial shapes, and the HLL path exposes the
  * partial-sketch → union re-aggregation pattern explicitly: compute
  * per-slice (per-day / per-partition) binary sketches ONCE, then answer
  * any rollup by unioning sketches — bytes, not rows, cross the shuffle.
  */
object Sketches {

  /** Approximate distinct values of `valueCol` per group (DataSketches
    * HLL, relative error ≈ 1.04/sqrt(2^lgK) ≈ 1.6% at the default lgK=12).
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col(valueCol), lit(lgK))).as("approx_distinct"))

  /** Per-slice partial sketches: one binary HLL per (group, slice). This is
    * the artifact to PERSIST — any later rollup unions sketches instead of
    * re-scanning rows.
    */
  def hllPartials(df: DataFrame, groupCols: Seq[String], sliceCol: String,
                  valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy((groupCols :+ sliceCol).map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Roll partial sketches up to the group level: union then estimate.
    * Estimates are identical to sketching the unsliced data directly —
    * HLL union is lossless over the same lgK.
    */
  def hllMerge(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("approx_distinct"))

  /** Per-group quantiles. `accuracy` is the GK summary size: memory is
    * O(accuracy) per group regardless of group cardinality, and any input
    * with fewer rows than `accuracy` is summarized exactly.
    */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      probs: Seq[Double],
                      accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Exact top-k heavy hitters per group: two-stage — hash-agg counts on
    * (group, value) (map-side partials absorb hot values), then a top-k
    * window over the DISTINCT values of each group (cardinality of the
    * sort is |distinct values|, not |rows|). Deterministic tie-break by
    * value.
    */
  def heavyHitters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   k: Int): DataFrame = {
    val counts = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("n").desc, col(valueCol))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate top-k heavy hitters per group via the Misra–Gries
    * mergeable summary ([[graft.functions.MisraGriesTopK]], a custom
    * Catalyst TypedImperativeAggregate — Spark has no built-in that can
    * ENUMERATE heavy items). One aggregation, state O(capacity) per
    * group, no |distinct|-sized sort: the at-scale alternative to
    * [[heavyHitters]] when the distinct-value set per group is itself
    * too big to rank exactly. Counts are under-estimates within
    * N/capacity; with capacity ≥ |distinct| the result is exact (the
    * oracle-checked regime).
    *
    * @return one row per (group, rank): groupCols + (item, est_count, rank)
    */
  def approxTopK(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 k: Int, capacity: Int = 4096): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.FreqSketch.approx_top_k(
        col(valueCol), capacity, k).as("_top"))
      .select(groupCols.map(col) :+ posexplode(col("_top")).as(Seq("_i", "_e")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("_e.item").as("item"),
        col("_e.est_count").as("est_count"),
        (col("_i") + 1).cast("int").as("rank")): _*)

  /** Count–min frequency sketch per group (binary, mergeable): the
    * transport format for "how often does value X occur" questions that
    * must be answered later without the raw rows.
    */
  def countMin(df: DataFrame, groupCols: Seq[String], valueCol: String,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence),
        lit(seed)).as("cms"))
}
