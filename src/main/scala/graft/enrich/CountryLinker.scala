package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Country-mention enrichment: link each Output to Countries whose common
  * name appears as a substring of its abstract (preferred) or title.
  *
  * Reference `create_graph_from_doi.py:294-329` — a Cypher theta-join
  * `WHERE o.abstract CONTAINS c.name` guarded by
  * `NOT exists((o)-[:refers_to]->(c))`, with a `CALL { … LIMIT 1 }` variant
  * that caps at one new edge per country per run; `create_graph.py:244-258`
  * is the uncapped variant. CONTAINS is case-sensitive (SURVEY.md §7.5.5).
  *
  * Spark shape: broadcast-nested-loop join of outputs × countries with a
  * substring predicate. The countries side is ~250 rows → explicit
  * `broadcast()` makes this a single shuffle-free pass over outputs no
  * matter how large the outputs table is; the anti-join against existing
  * edges shuffles only candidate pairs (tiny).
  */
object CountryLinker {

  /** Candidate (output_uuid, country_id) pairs by substring containment.
    * @param field "abstract" or "title" (the reference links both, abstract
    *   first; rows with null field produce no pairs)
    */
  def mentionPairs(outputs: DataFrame, countries: DataFrame,
                   field: String): DataFrame = {
    outputs.select(col("uuid").as("src"), col(field).as("_text"))
      .filter(col("_text").isNotNull)
      .join(broadcast(countries.select(col("id").as("dst"), col("name"))),
        col("_text").contains(col("name")))
      .select("src", "dst")
  }

  /** Uncapped variant (create_graph.py:244-258): all new abstract-mention
    * pairs not already linked (anti-join = NOT EXISTS guard, J8).
    */
  def newLinks(outputs: DataFrame, countries: DataFrame,
               existing: DataFrame, field: String = "abstract"): DataFrame = {
    mentionPairs(outputs, countries, field)
      .dropDuplicates("src", "dst")
      .join(existing.select("src", "dst"), Seq("src", "dst"), "left_anti")
  }

  /** CLI variant (create_graph_from_doi.py:303-311,318-326): at most ONE new
    * edge per country per run (`CALL { … LIMIT 1 }`) — a window top-1 per
    * country over the candidate pairs. Winner selection is deterministic
    * (lowest output uuid) where the reference's is storage-order arbitrary.
    * Catalyst plans the rank-1 filter as WindowGroupLimit, so only one row
    * per country survives the shuffle.
    */
  def newLinksTop1PerCountry(outputs: DataFrame, countries: DataFrame,
                             existing: DataFrame,
                             field: String = "abstract"): DataFrame = {
    val cands = newLinks(outputs, countries, existing, field)
    val w = Window.partitionBy("dst").orderBy("src")
    cands.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
