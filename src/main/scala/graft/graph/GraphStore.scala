package graft.graph

import graft.model.Schemas
import org.apache.hadoop.fs.Path
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
  * 128-131) become anti-join + append; update-mode property refresh (Cypher
  * re-save, doi.py:215-250) becomes a merge-on-key rewrite; uniqueness
  * constraints (create_graph.py:261-274) become assertion queries instead of
  * DDL.
  *
  * Scale notes: appends are partitioned writes (no coalesce(1)); MERGE dedup
  * is a shuffle on the edge key only for the incoming batch — the existing
  * table is only scanned, and the anti-join broadcasts whichever side is
  * small. `result_type` is the reference's one non-key index
  * (create_graph.py:261-274) → retained as the outputs PARTITION column, so
  * result_type filters prune at the directory level. All filesystem access
  * goes through the Hadoop FileSystem API — the store works identically on
  * file:, hdfs: and s3a: warehouses.
  */
class GraphStore(val spark: SparkSession, val root: String) {
  import GraphStore._

  private def path(kind: String, name: String) = s"$root/$kind/$name"

  private def fs(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(p: String): Boolean = {
    val hp = new Path(p)
    fs(hp).exists(hp)
  }

  def nodeTable(name: String): DataFrame = read(path("nodes", name), nodeSchema(name))
  def edgeTable(name: String): DataFrame = read(path("edges", name), edgeSchema(name))

  private def read(p: String, schema: StructType): DataFrame =
    if (exists(p)) spark.read.schema(schema).parquet(p)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** CREATE-if-absent node upsert (S7): anti-join incoming on the key, then
    * append only genuinely new rows. Incoming duplicates resolve arbitrarily
    * via dropDuplicates (callers pre-canonicalize when order matters).
    */
  def upsertNodes(name: String, incoming: DataFrame, key: String): Unit = {
    val existing = nodeTable(name).select(key)
    val fresh = incoming
      .dropDuplicates(key)
      .join(existing, Seq(key), "left_anti")
    append(path("nodes", name), align(fresh, nodeSchema(name)), name)
  }

  /** Update-mode MERGE (reference `--update`, doi.py:215-250 +
    * create_graph_from_doi.py:219-224): incoming rows REPLACE existing rows
    * with the same key (property refresh) and genuinely new keys are
    * inserted. Implemented as a key-anti-join of the existing table against
    * the batch + union, rewritten via a temp directory + rename (never
    * overwrite a path that the plan is still reading).
    */
  def mergeNodes(name: String, incoming: DataFrame, key: String): Unit = {
    val schema = nodeSchema(name)
    val batch = align(incoming.dropDuplicates(key), schema)
    val kept = nodeTable(name)
      .join(batch.select(key), Seq(key), "left_anti")
    rewrite(path("nodes", name), align(kept, schema).unionByName(batch), name)
  }

  /** MERGE edge upsert (S8): insert-if-absent on (src, dst). */
  def mergeEdges(name: String, incoming: DataFrame): Unit = {
    val existing = edgeTable(name).select("src", "dst")
    val fresh = incoming
      .dropDuplicates("src", "dst")
      .join(existing, Seq("src", "dst"), "left_anti")
    append(path("edges", name), align(fresh, edgeSchema(name)), name)
  }

  /** `MATCH (n) DETACH DELETE n` (S9): drop the warehouse. */
  def truncate(): Unit = {
    val hp = new Path(root)
    val f = fs(hp)
    if (f.exists(hp)) { f.delete(hp, true); () }
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

  private def writer(df: DataFrame, table: String) = {
    val w = df.write
    // outputs partitioned by the reference's one non-key index
    if (table == "outputs") w.partitionBy("result_type") else w
  }

  private def append(p: String, df: DataFrame, table: String): Unit =
    writer(df, table).mode(SaveMode.Append).parquet(p)

  /** Full-table rewrite via tmp dir + rename: the merged plan reads the
    * current files, so writing in place would corrupt the scan. Write to
    * `<path>__tmp`, then swap.
    */
  private def rewrite(p: String, df: DataFrame, table: String): Unit = {
    val tmp = p + "__tmp"
    writer(df, table).mode(SaveMode.Overwrite).parquet(tmp)
    val hp = new Path(p)
    val ht = new Path(tmp)
    val f = fs(hp)
    if (f.exists(hp)) f.delete(hp, true)
    f.rename(ht, hp)
    ()
  }

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
