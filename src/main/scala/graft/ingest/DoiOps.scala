package graft.ingest

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DOI-batch operations: normalization, pattern partition, existence joins,
  * and the per-run tracker that feeds the metrics report.
  *
  * Reference: `src/research_index_backend/doi.py` (DOIManager). The
  * reference tracks each submitted DOI in a dict of boolean flags and
  * resolves existence with ONE batched Cypher
  * (`UNWIND $dois … OPTIONAL MATCH`, doi.py:157-180). Here the tracker is a
  * DataFrame and existence is a broadcast left-outer join — same semantics,
  * set-at-a-time, shuffle-free when the submission list is small.
  */
object DoiOps {

  /** Read a headerless one-DOI-per-line list (FIXTURES.md §9), preserving
    * file order so `--limit` keeps head-N semantics (reference
    * doi.py:104-110). `submission_order` is the global line index.
    */
  def readDoiList(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    spark.read.text(path)
      .withColumn("submission_order", monotonically_increasing_id())
      .select(trim(col("value")).as("raw_doi"), col("submission_order"))
      .filter(col("raw_doi") =!= "")
  }

  /** Normalize (F3) + pattern-partition (P5) + intra-batch dedup (A3).
    * Output columns: raw_doi, doi, submission_order, valid_pattern,
    * duplicate (true on every submission after the first of a DOI).
    * All flags are kept — invalid/duplicate rows feed the metrics (A2).
    */
  def validate(dois: DataFrame, limit: Option[Int] = None): DataFrame = {
    val limited = limit.foldLeft(
      dois.orderBy("submission_order"))((d, n) => d.limit(n))
    val norm = limited.withColumn("doi", normalize_doi(col("raw_doi")))
      .withColumn("valid_pattern", valid_doi(col("doi")))
    val w = Window.partitionBy("doi").orderBy("submission_order")
    norm.withColumn("duplicate", row_number().over(w) > 1)
  }

  /** Batched existence check (J1): flag DOIs already present in the outputs
    * node table. Equivalent of the reference's single UNWIND+OPTIONAL MATCH
    * (doi.py:157-180). The submission batch is tiny (default --limit 50) →
    * broadcast it and stream over outputs; at 100 TB of outputs this is one
    * shuffle-free pass.
    */
  def markExisting(tracker: DataFrame, outputs: DataFrame): DataFrame = {
    val existing = outputs.select(col("doi")).distinct()
      .withColumn("already_exists", lit(true))
    tracker.hint("broadcast")
      .join(existing, Seq("doi"), "left_outer")
      .withColumn("already_exists",
        coalesce(col("already_exists"), lit(false)))
  }

  /** The DOIs to actually ingest this run: valid pattern, first submission,
    * and (unless update mode) not already present. Reference
    * doi.py:193-200 + create_graph_from_doi.py:219-224.
    */
  def toIngest(tracker: DataFrame, update: Boolean = false): DataFrame = {
    val base = tracker.filter(col("valid_pattern") && !col("duplicate"))
    if (update) base else base.filter(!col("already_exists"))
  }
}
