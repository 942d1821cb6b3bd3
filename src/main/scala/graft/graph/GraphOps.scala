package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-shaped analytics over the property-graph tables, via GraphX
  * (per BASELINE.json "spark_approach": GraphX for graph analytics).
  *
  * The reference delegates graph traversal to Memgraph (e.g. the unit_of
  * workstream hierarchy, create_graph.py:162-169, and author/output
  * neighborhood queries). Batch-analytic equivalents:
  *
  *  - [[unitHierarchy]]   — transitive closure of unit_of (Pregel label
  *                          propagation from the roots, O(depth) supersteps)
  *  - [[coauthorComponents]] — connected components of the co-authorship
  *                          graph (GraphX connectedComponents, the standard
  *                          batch primitive Memgraph has no equivalent for)
  *  - [[authorRank]]      — PageRank over co-authorship, an analytics
  *                          upgrade the row-at-a-time reference cannot do
  *
  * Vertex ids are xxhash64 of the uuid — deterministic, collision-safe at
  * any realistic node count (64-bit), computed distributed.
  */
object GraphOps {

  private def vid(c: org.apache.spark.sql.Column) = xxhash64(c)

  /** Build a GraphX graph from node uuids and (src, dst) edge tables. */
  def buildGraph(nodes: DataFrame, edges: DataFrame,
                 uuidCol: String = "uuid"): Graph[String, Int] = {
    val verts: RDD[(VertexId, String)] = nodes
      .select(vid(col(uuidCol)).as("vid"), col(uuidCol))
      .rdd.map(r => (r.getLong(0), r.getString(1)))
    val es: RDD[Edge[Int]] = edges
      .select(vid(col("src")).as("s"), vid(col("dst")).as("d"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph(verts, es)
  }

  /** Transitive closure of the unit_of hierarchy: for every unit, the set
    * of ancestor unit ids (workstream containment). Iterative DataFrame
    * self-joins with early exit — depth-bounded (org hierarchies are
    * shallow); each round is one shuffle on the frontier only.
    *
    * @param unitOf edge table (src = child unit id, dst = parent unit id)
    * @return (unit_id, ancestor_id, depth)
    */
  def unitHierarchy(unitOf: DataFrame, maxDepth: Int = 16): DataFrame = {
    val base = unitOf.select(col("src").as("unit_id"),
      col("dst").as("ancestor_id"), lit(1).as("depth"))
    var closure = base
    var frontier = base
    var d = 1
    while (d < maxDepth && !frontier.isEmpty) {
      val next = frontier.alias("f")
        .join(unitOf.alias("e"), col("f.ancestor_id") === col("e.src"))
        .select(col("f.unit_id"), col("e.dst").as("ancestor_id"),
          (col("f.depth") + 1).as("depth"))
        .join(closure.select("unit_id", "ancestor_id"),
          Seq("unit_id", "ancestor_id"), "left_anti")
      frontier = next.cache()
      closure = closure.union(frontier)
      d += 1
    }
    closure
  }

  /** Connected components of the co-authorship graph: two authors are
    * linked when they share an output. The co-author edge list is derived
    * with one self-join of author_of on the output (shuffle on output
    * uuid), then GraphX connectedComponents (Pregel) finds the clusters.
    *
    * @param authorOf edge table (src = author uuid, dst = output uuid)
    * @return (author_uuid, component_id) — component_id is the min vertex
    *   hash in the component (stable across runs)
    */
  def coauthorComponents(authorOf: DataFrame): DataFrame = {
    val spark = authorOf.sparkSession
    import spark.implicits._
    val a = authorOf.select(col("dst").as("o"), col("src").as("a1"))
    val b = authorOf.select(col("dst").as("o"), col("src").as("a2"))
    val coedges = a.join(b, Seq("o")).filter(col("a1") < col("a2"))
      .select("a1", "a2").distinct()
    val authors = authorOf.select(col("src").as("uuid")).distinct()
    val g = buildGraph(authors, coedges.select(col("a1").as("src"),
      col("a2").as("dst")))
    val cc = g.connectedComponents()
    val ccDf = cc.vertices.toDF("vid", "component_id")
    authors.withColumn("vid", xxhash64(col("uuid")))
      .join(ccDf, "vid")
      .select(col("uuid").as("author_uuid"), col("component_id"))
  }

  /** PageRank over the co-authorship graph (centrality of authors). */
  def authorRank(authorOf: DataFrame, tol: Double = 0.001): DataFrame = {
    val spark = authorOf.sparkSession
    import spark.implicits._
    val a = authorOf.select(col("dst").as("o"), col("src").as("a1"))
    val b = authorOf.select(col("dst").as("o"), col("src").as("a2"))
    val coedges = a.join(b, Seq("o")).filter(col("a1") =!= col("a2"))
      .select("a1", "a2").distinct()
    val authors = authorOf.select(col("src").as("uuid")).distinct()
    val g = buildGraph(authors, coedges.select(col("a1").as("src"),
      col("a2").as("dst")))
    val pr = g.pageRank(tol).vertices.toDF("vid", "pagerank")
    authors.withColumn("vid", xxhash64(col("uuid")))
      .join(pr, "vid")
      .select(col("uuid").as("author_uuid"), col("pagerank"))
  }
}
