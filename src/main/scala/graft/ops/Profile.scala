package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the schema-health report a pipeline runs before and
  * after every transformation batch: one row per profiled column with row,
  * null, and distinct counts plus string-rendered min/max.
  *
  * Shape: ONE aggregation pass computes every column's stats together
  * (count/min/max are plain partial aggs; the exact distinct counts rewrite
  * into a single Expand — k-way fan-out, one shuffle, no per-column jobs),
  * producing a single row that a static inline explode unpivots into the
  * per-column report. No collect, no loop over columns on the driver.
  *
  * At 100 TB the Expand fan-out (k× the scan) is the honest price of EXACT
  * distinct counts; when approximate counts are acceptable swap
  * `countDistinct` for `approx_count_distinct` via `exact = false` and the
  * pass collapses to one non-expanded aggregation (HLL partials).
  */
object Profile {

  /** Profile the named columns (default: all top-level columns).
    *
    * @return (column, n_rows, n_nulls, n_distinct, min_val, max_val) —
    *   min/max rendered as strings so mixed-type reports union into one
    *   frame; null-only columns render empty strings
    */
  def profileColumns(df: DataFrame, cols: Seq[String] = Nil,
                     exact: Boolean = true): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "nothing to profile")
    val aggs = names.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(count(lit(1)).as("_rows"), aggs: _*)
    val stacked = explode(array(names.map(c => struct(
      lit(c).as("column"),
      col("_rows").as("n_rows"),
      (col("_rows") - col(s"_cnt_$c")).as("n_nulls"),
      col(s"_nd_$c").cast("long").as("n_distinct"),
      coalesce(col(s"_min_$c"), lit("")).as("min_val"),
      coalesce(col(s"_max_$c"), lit("")).as("max_val"))): _*))
    one.select(stacked.as("_p")).select("_p.*")
  }
}
