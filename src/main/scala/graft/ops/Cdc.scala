package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: turn an append-only change log into
  * slowly-changing-dimension (SCD type 2) history and point-in-time
  * snapshots.
  *
  * A corpus/metadata catalog at 100 TB is maintained exactly this way —
  * documents are re-crawled, re-scored, re-licensed; the log is the cheap
  * append, and history/snapshot are derived views. Both operators are one
  * window function over (key, ts): a single hash shuffle on the key,
  * linear in log size, no self-join (the naive "match each version with
  * the next" formulation is a range self-join; `lead` is its O(n) form).
  */
object Cdc {

  /** SCD2 history from a change log: each version row gets
    * `valid_from` (its own ts), `valid_to` (the NEXT version's ts for the
    * same key, null while current) and `is_current`. Ties on ts are broken
    * by `seqCol` (a unique per-row id) so the interval chain is
    * deterministic.
    */
  def scd2(log: DataFrame, keys: Seq[String], tsCol: String,
           seqCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
    log
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time snapshot: the latest version of every key with
    * ts <= `asOf`, dropping keys whose latest version satisfies
    * `isDelete` (tombstones). One aggregation-free window pass over the
    * pre-filtered log — the filter prunes before the shuffle, so a
    * snapshot "as of last tuesday" over years of log only shuffles rows
    * up to that date.
    */
  def snapshotAt(log: DataFrame, keys: Seq[String], tsCol: String,
                 seqCol: String, asOf: Column,
                 isDelete: Column = lit(false)): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc, col(seqCol).desc)
    log.filter(col(tsCol) <= asOf)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !isDelete)
      .drop("_rn")
  }
}
