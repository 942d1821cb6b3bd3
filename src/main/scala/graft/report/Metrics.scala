package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-metrics report — the reference's 14 counters
  * (`src/research_index_backend/doi.py:202-283`) computed in ONE conditional
  * aggregation pass over the tracker DataFrame (partial + final hash agg:
  * no per-counter scans, no driver loops).
  */
object Metrics {

  /** Tracker columns consumed: valid_pattern, duplicate, already_exists,
    * openaire_metadata, openalex_metadata, ingestion_success (the last three
    * optional — absent columns count as false).
    */
  def ingestionReport(tracker: DataFrame): DataFrame = {
    val t = Seq("openaire_metadata", "openalex_metadata", "ingestion_success")
      .foldLeft(tracker)((d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(false)))
    def cnt(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 1L)), lit(0L))
    t.agg(
      count(lit(1)).as("dois_submitted"),
      cnt(col("duplicate")).as("duplicated_submissions"),
      cnt(col("valid_pattern")).as("valid_pattern"),
      cnt(!col("valid_pattern")).as("invalid_pattern"),
      cnt(col("already_exists")).as("already_exists"),
      cnt(col("valid_pattern") && !col("duplicate") && !col("already_exists"))
        .as("new_dois"),
      cnt(col("openaire_metadata")).as("openaire_metadata_success"),
      cnt(col("openalex_metadata")).as("openalex_metadata_success"),
      cnt(col("ingestion_success")).as("ingested"),
      cnt(col("valid_pattern") && !col("ingestion_success"))
        .as("failed_ingestion"))
  }

  /** Duplicate-submission detail (A3, doi.py:209-213): DOIs submitted more
    * than once with their multiplicity.
    */
  def duplicateSubmissions(tracker: DataFrame): DataFrame =
    tracker.groupBy("doi").count().filter(col("count") > 1)

  /** Output-type census (A5, notebooks/summary.ipynb): one reporting query
    * over the outputs node table.
    */
  def resultTypeCensus(outputs: DataFrame): DataFrame =
    outputs.groupBy("result_type").count()
}
