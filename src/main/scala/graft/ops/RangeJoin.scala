package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Interval (range) join — "point t inside [start, end]" — as a binned
  * equi-join.
  *
  * Catalyst's only native plan for a pure range predicate is a (broadcast)
  * nested-loop join: fine when the interval side fits in a broadcast,
  * catastrophic otherwise. Quantizing the domain into fixed-width bins
  * turns it into a plain hash-shuffle equi-join: every interval fans out
  * to the bins it overlaps, every point lands in exactly ONE bin, the join
  * keys on (equality keys, bin), and the exact range predicate runs as a
  * cheap post-filter. Because the point owns a single bin, each
  * (point, interval) candidate meets exactly once — no dedup pass.
  *
  * Cost model: interval fan-out ≈ length/binWidth + 1 rows; candidates per
  * point ≈ intervals overlapping its bin. Pick binWidth near the typical
  * (p50–p90) interval length — too small explodes the interval side, too
  * large degrades the post-filter selectivity. Both failure modes stay
  * linear; neither is the quadratic blowup of the nested loop. Skewed hot
  * bins are split by AQE like any other shuffle skew.
  */
object RangeJoin {

  /** Normalize a point/bound column to a long: timestamps → epoch micros,
    * dates → epoch days, integrals pass through.
    */
  private def rep(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      // session-tz shift is applied identically to point and bounds, so
      // binning and the exact post-filter are unaffected by the zone
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case DateType      => datediff(col(c), lit("1970-01-01").cast("date")).cast("long")
      case _             => col(c).cast("long")
    }

  /** The unit `rep` normalizes a column into. Mixed units across the three
    * range columns (e.g. a DateType point against TimestampType bounds)
    * would bin days against micros — every join silently empty — so
    * [[pointInInterval]] rejects that up front.
    */
  private def unitOf(df: DataFrame, c: String): String =
    df.schema(c).dataType match {
      case TimestampType    => "epoch-micros"
      case TimestampNTZType => "epoch-micros"
      case DateType         => "epoch-days"
      case _                => "integral"
    }

  /** Reject inputs that already carry the operator's internal working
    * columns (or its output columns): they would hit ambiguous-column
    * analysis errors or silently shadow user data instead of the intended
    * fail-fast.
    */
  private def requireNoReserved(dfs: Seq[DataFrame], reserved: Seq[String],
                                op: String): Unit = {
    val hit = dfs.flatMap(_.columns).toSet.intersect(reserved.toSet)
    require(hit.isEmpty,
      s"$op reserves column names ${reserved.mkString(", ")} internally; " +
        s"rename the input columns: ${hit.mkString(", ")}")
  }

  /** Floor-division bin id over the named (long) column `c`. `pmod` is
    * non-negative so the numerator is exactly divisible, and `div` keeps
    * the arithmetic in longs end-to-end (`/` would detour through double,
    * which rounds integers past 2^53).
    */
  private def bin(c: String, w: Long): Column =
    expr(s"($c - pmod($c, ${w}L)) div ${w}L")

  /** Inner point-in-interval join: each `points` row joins every
    * `intervals` row sharing `keys` with startCol <= pointCol <= endCol
    * (inclusive both ends).
    *
    * Column names of the two inputs must be disjoint apart from `keys`
    * (rename before the call otherwise). Intervals with end < start are
    * dropped (no bins). binWidth is in the normalized unit of the bound
    * columns: micros for timestamps, days for dates, the raw unit for
    * integrals.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    requireNoReserved(Seq(points, intervals),
      Seq("_bin", "_pv", "_sv", "_ev"), "pointInInterval")
    val units = Seq(unitOf(points, pointCol), unitOf(intervals, startCol),
      unitOf(intervals, endCol))
    require(units.distinct.size == 1,
      s"point/start/end must normalize to one unit; got " +
        s"$pointCol=${units(0)}, $startCol=${units(1)}, $endCol=${units(2)}")
    val p = points.withColumn("_pv", rep(points, pointCol))
      .withColumn("_bin", bin("_pv", binWidth))
      .drop("_pv")
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("_sv", rep(intervals, startCol))
      .withColumn("_ev", rep(intervals, endCol))
      .withColumn("_bin",
        explode(sequence(bin("_sv", binWidth), bin("_ev", binWidth))))
      .drop("_sv", "_ev")
    p.join(iv, keys :+ "_bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }

  /** INTERVAL-OVERLAP join — every (left, right) pair of intervals with
    * `[ls, le] ∩ [rs, re] ≠ ∅` (closed ends) — the two-sided sibling of
    * [[pointInInterval]], same binning discipline: both sides fan out to
    * the bins they overlap and the join keys on (equality keys, bin).
    *
    * A pair overlapping k shared bins would meet k times; instead of a
    * dedup pass, the FIRST-SHARED-BIN rule keeps exactly one meeting: the
    * post-filter accepts a candidate only in bin = max(bin(ls), bin(rs)),
    * the first bin both intervals inhabit (both starts are ≤ it by
    * construction, and an overlapping pair provably shares it). A
    * distinct-free plan — the shuffle output is final.
    *
    * Cost: fan-out ≈ length/binWidth + 1 per row per side; pick binWidth
    * near the typical interval length, as [[pointInInterval]]. Column
    * names of the two inputs must be disjoint (beyond `keys`) — require'd
    * up front, no silent ambiguity.
    *
    * @return left columns + right columns (keys once) + `overlap_start` /
    *         `overlap_end` (the intersection, in the normalized long unit)
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    requireNoReserved(Seq(left, right),
      Seq("_bin", "_lsv", "_rsv", "_evx", "overlap_start", "overlap_end"),
      "intervalOverlap")
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlapCols.isEmpty,
      s"non-key column names must be disjoint; both sides have: " +
        overlapCols.mkString(", "))
    val units = Seq(unitOf(left, leftStart), unitOf(left, leftEnd),
      unitOf(right, rightStart), unitOf(right, rightEnd))
    require(units.distinct.size == 1,
      s"all four bounds must normalize to one unit; got ${units.mkString(", ")}")
    def fan(df: DataFrame, s: String, e: String, sv: String,
            binAs: String): DataFrame =
      df.filter(col(e) >= col(s))
        .withColumn(sv, rep(df, s))
        .withColumn("_evx", rep(df, e))
        .withColumn(binAs,
          explode(sequence(bin(sv, binWidth), bin("_evx", binWidth))))
        .drop("_evx")
    val l = fan(left, leftStart, leftEnd, "_lsv", "_bin")
    val r = fan(right, rightStart, rightEnd, "_rsv", "_bin")
    l.join(r, keys :+ "_bin")
      // overlap test + first-shared-bin: exactly one surviving meeting
      .filter(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd))
      .filter(col("_bin") ===
        greatest(bin("_lsv", binWidth), bin("_rsv", binWidth)))
      .withColumn("overlap_start", greatest(col("_lsv"), col("_rsv")))
      .withColumn("overlap_end",
        least(rep(left, leftEnd), rep(right, rightEnd)))
      .drop("_bin", "_lsv", "_rsv")
  }
}
