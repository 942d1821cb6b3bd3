package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Batch sessionization: split each key's event stream into sessions at
  * inactivity gaps — the batch twin of the streaming
  * `Streams.sessionize` (mapGroupsWithState) path, for backfills and
  * reprocessing over historical data.
  *
  * Shape: ONE shuffle on the keys, then two window passes over the same
  * (keys, ts) sort order — Catalyst reuses the single sort for both: a lag
  * to flag gap boundaries, a running sum to number them. Cost per key is
  * O(its rows); a hot key never fans out. This is the canonical
  * "boundary flag → prefix-sum" window composition, which is exactly
  * SQL-expressible and therefore oracle-checkable.
  */
object Sessions {

  /** Epoch micros of a timestamp column of EITHER flavor: the cast is an
    * identity on TIMESTAMP and a uniform session-tz shift on
    * TIMESTAMP_NTZ (`unix_micros` rejects NTZ directly) — gap and
    * duration arithmetic difference two such values, so the shift cancels.
    */
  private def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Annotate events with `session_index` (0-based per key, in ts order)
    * and a deterministic `session_id` string key-session composite.
    *
    * @param gapSeconds a new session starts when the gap since the
    *   previous event of the same key strictly exceeds this
    */
  def sessionize(events: DataFrame, keys: Seq[String], tsCol: String,
                 gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val newSession = coalesce(
      epochUs(col(tsCol)) - epochUs(lag(col(tsCol), 1).over(byKey)) >
        gapSeconds * 1000000L,
      lit(true)) // first event of a key opens a session
    events
      .withColumn("_boundary", newSession.cast("long"))
      .withColumn("session_index",
        (sum(col("_boundary")).over(byKey.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)) - 1).cast("long"))
      .withColumn("session_id",
        concat_ws("#", (keys.map(col) :+ col("session_index")): _*))
      .drop("_boundary")
  }

  /** Per-session rollup: bounds, duration, event count. */
  def sessionStats(sessionized: DataFrame, keys: Seq[String],
                   tsCol: String): DataFrame =
    sessionized.groupBy((keys :+ "session_index").map(col): _*)
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (epochUs(max(col(tsCol))) - epochUs(min(col(tsCol))))
          .as("duration_us"),
        count(lit(1)).as("n_events"))
}
