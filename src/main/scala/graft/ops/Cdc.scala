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

  /** Diff two corpus snapshots by key: every key classified as `added`
    * (new side only), `removed` (old side only), `changed` (present in
    * both, some compared column differs under null-safe equality) or
    * `unchanged` — the audit a pipeline runs between version N and N+1 of
    * a 100 TB corpus before promoting it ("yesterday's crawl replaced 2%
    * and silently dropped 40% — stop"). `changed_cols` names the
    * differing columns (input order, comma-joined) so the report says
    * WHAT moved, not just that something did.
    *
    * One full-outer hash equi-join on the key — both sides shuffle once,
    * AQE-splittable, no window, no collect. Comparison is null-safe
    * (`<=>`): null → value and value → null both count as changes, and a
    * key duplicated within a side fans out (the join is the audit; feed
    * deduped snapshots or the fan-out itself is the finding).
    *
    * @param compareCols columns to compare (default: every shared
    *                    non-key column)
    * @param includeUnchanged keep `unchanged` rows (default false — at
    *                         corpus scale the interesting set is the
    *                         delta, which is what survives the filter)
    * @return (keyCols..., status, changed_cols)
    */
  def snapshotDiff(old: DataFrame, neu: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String] = Nil,
                   includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "need key columns")
    val shared = old.columns.toSet.intersect(neu.columns.toSet)
    val cmp = if (compareCols.nonEmpty) compareCols
      else old.columns.toSeq.filter(c => shared(c) && !keyCols.contains(c))
    require(cmp.nonEmpty, "nothing to compare")
    require(((keyCols ++ cmp).toSet -- shared).isEmpty,
      "key/compare columns must exist in both snapshots")
    // guard ALL input columns, not just key+compare — a non-compared
    // 'status' column would survive into the join and make the
    // withColumn("status", ...) reference ambiguous at runtime
    val reserved = Seq("status", "changed_cols", "_ok", "_nk")
    val hit = (old.columns ++ neu.columns).toSet.intersect(reserved.toSet)
    require(hit.isEmpty,
      s"snapshotDiff reserves ${reserved.mkString(", ")}; " +
        s"rename: ${hit.mkString(", ")}")
    val cond = keyCols.map(c => col(s"_o.$c") <=> col(s"_n.$c"))
      .reduce(_ && _)
    // presence flags survive the outer join even when every payload
    // column is legitimately null on a present side
    val o = old.withColumn("_ok", lit(true)).as("_o")
    val n = neu.withColumn("_nk", lit(true)).as("_n")
    val changed = array(cmp.map(c =>
      when(!(col(s"_o.$c") <=> col(s"_n.$c")), lit(c))): _*)
    val diffed = o.join(n, cond, "full_outer")
      .withColumn("status",
        when(col("_o._ok").isNull, lit("added"))
          .when(col("_n._nk").isNull, lit("removed"))
          .when(size(filter(changed, _.isNotNull)) > 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("changed_cols",
        when(col("status") === "changed",
          array_join(filter(changed, _.isNotNull), ","))
          .otherwise(lit("")))
      .select(keyCols.map(c =>
        coalesce(col(s"_o.$c"), col(s"_n.$c")).as(c)) ++
        Seq(col("status"), col("changed_cols")): _*)
    if (includeUnchanged) diffed
    else diffed.filter(col("status") =!= "unchanged")
  }

  /** MERGE INTO for schema-equal snapshots — the upsert a corpus state
    * table takes each batch (Delta/Iceberg `MERGE` semantics without a
    * table format): source rows matched on the key REPLACE the target
    * row (update), unmatched source rows append (insert), source rows
    * satisfying `isDelete` drop their matched target row and are never
    * inserted; target rows untouched by the source pass through. The
    * result is the next version of the table.
    *
    * Shape: one left-anti equi-join on the key (target vs source keys —
    * a matched target row is superseded whether the source updates or
    * deletes it) + a filter + a narrow union. No window, no full outer
    * join — the anti join shuffles each side once and AQE splits skewed
    * keys. At 100 TB with a target bucketed by the key the anti join is
    * shuffle-free on the target side.
    *
    * The source must be key-unique (two source rows on one key would
    * both insert — classic MERGE raises; feed deduped batches, e.g.
    * through [[snapshotAt]]).
    *
    * @param isDelete predicate over SOURCE rows marking deletions
    *                 (default: none)
    */
  def mergeInto(target: DataFrame, source: DataFrame, keyCols: Seq[String],
                isDelete: Column = lit(false)): DataFrame = {
    require(keyCols.nonEmpty, "need key columns")
    require(target.columns.toSeq == source.columns.toSeq,
      "mergeInto needs schema-equal snapshots (same columns, same order); " +
        s"target=${target.columns.mkString(",")} " +
        s"source=${source.columns.mkString(",")}")
    val cond = keyCols.map(c => col(s"_t.$c") <=> col(s"_s.$c"))
      .reduce(_ && _)
    val kept = target.as("_t")
      .join(source.as("_s"), cond, "left_anti")
    // a NULL delete predicate means not-delete (classic MERGE): without
    // the coalesce, !NULL filters the source row out AFTER the anti
    // join already removed its matched target row — silent data loss
    kept.unionByName(source.filter(!coalesce(isDelete, lit(false))))
  }
}
