package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively, built
  * from the union + ordered-window composition rather than a range join:
  *
  *   left row @ t matches the LATEST right row with right.ts <= t per key.
  *
  * Tag both inputs, union, and take `last(value, ignoreNulls)` over a
  * per-key window ordered by (ts, side) with right rows sorting before
  * left rows at equal timestamps (inclusive <= semantics). ONE shuffle on
  * the key, rows processed in timestamp order — no per-row range probe
  * and no candidate fan-out, so a hot key costs O(its rows), not
  * O(left x right). This is the scale-correct shape for "decorate every
  * event with the latest dimension state as of its timestamp".
  *
  * Right rows should be unique per (keys, ts) — pre-aggregate otherwise
  * (ties at identical timestamps would be arbitrary).
  */
object AsOfJoin {

  /** Left as-of join: every left row, plus `asof_<v>` columns from the
    * matched right row and `asof_ts` (null when no right row precedes).
    *
    * `tolerance` bounds the LOOKBACK (the feature-store staleness rule:
    * "latest state, but never older than X"): a match farther than
    * `tolerance` behind the left timestamp is nulled out, as if no right
    * row preceded. Unit is the normalized timestamp representation —
    * MICROSECONDS for timestamp columns, DAYS for dates, the native unit
    * for integrals (the [[RangeJoin]] convention). The bound applies as a
    * post-window filter, so the plan is the same one-shuffle window —
    * tolerance costs nothing.
    */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valCols: Seq[String],
               prefix: String = "asof_",
               tolerance: Option[Long] = None): DataFrame =
    asof(left, right, keys, tsCol, valCols, prefix, forward = false,
      tolerance)

  /** Forward as-of join: matches the EARLIEST right row with
    * right.ts >= left.ts per key ("next state at or after the event" —
    * e.g. time-to-next-action features). Same one-shuffle union + ordered
    * window as [[asofLeft]], with the frame flipped to
    * [currentRow, unboundedFollowing] and `first(ignoreNulls)` instead of
    * `last`.
    */
  def asofLeftForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      tsCol: String, valCols: Seq[String],
                      prefix: String = "asof_",
                      tolerance: Option[Long] = None): DataFrame =
    asof(left, right, keys, tsCol, valCols, prefix, forward = true,
      tolerance)

  /** Normalize a ts column to a long for tolerance arithmetic: timestamps
    * → epoch micros, dates → epoch days, integrals pass through (the
    * [[RangeJoin]] convention, applied identically to both sides).
    */
  private def rep(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.DateType =>
        datediff(c, lit("1970-01-01").cast("date")).cast("long")
      case _ => c.cast("long")
    }

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, valCols: Seq[String], prefix: String,
                   forward: Boolean,
                   tolerance: Option[Long] = None): DataFrame = {
    require(tolerance.forall(_ >= 0), "tolerance must be >= 0")
    require(tolerance.isEmpty ||
        (!left.columns.contains("_within") && !right.columns.contains("_within")),
      "asof with tolerance reserves the working column _within; rename it")
    val leftOther = left.columns.filterNot(c => keys.contains(c))
    val tsType = right.schema(tsCol).dataType

    val l2 = valCols.foldLeft(
      left.withColumn("_side", lit(1))
        .withColumn("_asof_ts", lit(null).cast(tsType))) { (d, v) =>
      d.withColumn(s"_v_$v", lit(null).cast(right.schema(v).dataType))
    }
    val r2cols: Seq[Column] =
      keys.map(col) ++
        leftOther.map(c =>
          if (c == tsCol) col(tsCol)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("_side"), col(tsCol).as("_asof_ts")) ++
        valCols.map(v => col(v).as(s"_v_$v"))
    val r2 = right.select(r2cols: _*)
      .select(l2.columns.map(col).toIndexedSeq: _*) // align column order

    // side tie-break at equal timestamps keeps both directions INCLUSIVE:
    // backward scans [start, current] with right (side 0) sorted before
    // left; forward scans [current, end] with left sorted before right
    val w0 = Window.partitionBy(keys.map(col): _*)
    val w =
      if (forward) w0.orderBy(col(tsCol).asc, col("_side").desc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.orderBy(col(tsCol).asc, col("_side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def pick(c: Column): Column =
      if (forward) first(c, ignoreNulls = true).over(w)
      else last(c, ignoreNulls = true).over(w)
    val carried = valCols.foldLeft(
      l2.unionByName(r2).withColumn(prefix + "ts", pick(col("_asof_ts")))) {
      (d, v) => d.withColumn(prefix + v, pick(col(s"_v_$v")))
    }
    val matched = carried.filter(col("_side") === 1)
      .drop(("_side" +: "_asof_ts" +: valCols.map(v => s"_v_$v")): _*)
    tolerance match {
      case None => matched
      case Some(tol) =>
        val gap =
          if (forward) rep(col(prefix + "ts"), tsType) - rep(col(tsCol), tsType)
          else rep(col(tsCol), tsType) - rep(col(prefix + "ts"), tsType)
        // pin the verdict in its own column FIRST: the null-outs below
        // overwrite prefix+ts, which the gap expression reads
        val flagged = matched.withColumn("_within",
          col(prefix + "ts").isNotNull && gap <= tol)
        ((prefix + "ts") +: valCols.map(prefix + _)).foldLeft(flagged) {
          (d, c) => d.withColumn(c, when(col("_within"), col(c)))
        }.drop("_within")
    }
  }
}
