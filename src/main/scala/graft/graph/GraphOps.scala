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
  *  - [[unitHierarchy]]   — transitive closure of unit_of (frontier
  *                          iteration, O(depth) rounds, bounded lineage)
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

  /** Build a GraphX graph from node uuids and (src, dst) edge tables.
    * Inputs are localCheckpoint-ed first: GraphX iterates its RDDs many
    * times, and an uncached .rdd view of a Catalyst plan re-executes the
    * whole upstream dataflow (including broadcast subplans) on every pass.
    */
  def buildGraph(nodes: DataFrame, edges: DataFrame,
                 uuidCol: String = "uuid"): Graph[String, Int] = {
    val verts: RDD[(VertexId, String)] = nodes
      .select(vid(col(uuidCol)).as("vid"), col(uuidCol))
      .localCheckpoint(true)
      .rdd.map(r => (r.getLong(0), r.getString(1)))
    val es: RDD[Edge[Int]] = edges
      .select(vid(col("src")).as("s"), vid(col("dst")).as("d"))
      .localCheckpoint(true)
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph(verts, es)
  }

  /** Transitive closure of the unit_of hierarchy: for every unit, the set
    * of ancestor unit ids (workstream containment). Iterative DataFrame
    * self-joins with early exit — depth-bounded (org hierarchies are
    * shallow); each round is one shuffle on the frontier only. The frontier
    * is localCheckpoint-ed each round (bounded lineage — no exponential
    * plan growth) and the previous round's blocks are released.
    *
    * @param unitOf edge table (src = child unit id, dst = parent unit id)
    * @return (unit_id, ancestor_id, depth)
    */
  def unitHierarchy(unitOf: DataFrame, maxDepth: Int = 16): DataFrame = {
    val edges = unitOf.select(col("src"), col("dst")).localCheckpoint(true)
    val base = edges.select(col("src").as("unit_id"),
      col("dst").as("ancestor_id"), lit(1).as("depth"))
      .localCheckpoint(true)
    var closure = base
    var frontier = base
    var d = 1
    while (d < maxDepth && !frontier.isEmpty) {
      val next = frontier.alias("f")
        .join(edges.alias("e"), col("f.ancestor_id") === col("e.src"))
        .select(col("f.unit_id"), col("e.dst").as("ancestor_id"),
          (col("f.depth") + 1).as("depth"))
        .join(closure.select("unit_id", "ancestor_id"),
          Seq("unit_id", "ancestor_id"), "left_anti")
        .localCheckpoint(true) // eager: materializes + truncates lineage
      val prev = frontier
      val prevClosure = closure
      frontier = next
      closure = closure.union(frontier).localCheckpoint(true)
      prev.unpersist()
      prevClosure.unpersist()
      d += 1
    }
    edges.unpersist()
    if (!(frontier eq closure)) frontier.unpersist()
    closure
  }

  /** Contributor-graph edge list WITHOUT the k-squared self-join: instead
    * of pairing every two members of a group (k² rows per group — a hub
    * output with 10⁴ contributors would emit 10⁸ edges), emit a STAR per
    * group: every member links to the group's minimum member. k-1 edges per
    * group, identical connectivity (any two members of the group are
    * connected through the hub), so connected components are EXACTLY the
    * same. Output size is linear in the input — skew-proof by construction.
    */
  private def starEdges(memberOf: DataFrame): DataFrame = {
    val hub = memberOf.groupBy("o").agg(min(col("m")).as("src"))
    memberOf.join(hub, Seq("o"))
      .filter(col("m") =!= col("src"))
      .select(col("src"), col("m").as("dst"))
      .distinct()
  }

  /** Connected components of the co-authorship graph: two authors are
    * linked when they share an output. Star-edge construction (see
    * [[starEdges]]) keeps the edge list linear in |author_of| — no k² hub
    * blowup — then the alternating large/small-star DataFrame CC
    * ([[ConnectedComponents]]) finds the clusters without leaving Catalyst.
    * The raw component label (min vertex hash) is normalized to the MIN
    * MEMBER UUID per component, which is deterministic, hash-free, and
    * reproducible by a plain min-label fixpoint (oracle-checkable).
    *
    * @param authorOf edge table (src = author uuid, dst = output uuid)
    * @return (author_uuid, component_id) — component_id is the min author
    *   uuid in the component
    */
  def coauthorComponents(authorOf: DataFrame): DataFrame = {
    // hash BOTH keys to longs ONCE up front: every downstream shuffle —
    // including the big membership groupBy — moves 8-byte keys, not
    // strings (group identity by hash rests on the same 64-bit
    // no-collision assumption as vid itself). Star edges come out of a
    // SINGLE aggregation: collect_set dedupes members per group with
    // map-side partial aggregation, the set-min is the hub — no
    // membership-dedup shuffle, no hub join. Caveat: one group's member
    // set is one row, so beyond ~10^6 members per group prefer a
    // groupBy-min + join.
    val membership = authorOf
      .select(vid(col("dst")).as("o"), vid(col("src")).as("vid"))
    val star = membership.groupBy("o")
      .agg(collect_set(col("vid")).as("_vs"))
      .select(array_min(col("_vs")).as("src"), explode(col("_vs")).as("dst"))
      .filter(col("src") =!= col("dst"))
    // the vertex map is reused on both sides of the label normalization;
    // pin it once, release after the (small) result is materialized
    val verts = authorOf.select(col("src").as("m")).distinct()
      .select(vid(col("m")).as("vid"), col("m"))
      .localCheckpoint(true)
    val cc = graft.graph.ConnectedComponents.run(
      verts.select(col("vid").as("id")), star)
    val labeled = verts.join(cc, verts("vid") === cc("id"))
    // normalize: hash label -> min member uuid (deterministic, oracle-able)
    val canon = labeled.groupBy("component_id").agg(min(col("m")).as("_cm"))
    val out = labeled.join(canon, Seq("component_id"))
      .select(col("m").as("author_uuid"), col("_cm").as("component_id"))
      .localCheckpoint(true)
    verts.unpersist()
    out
  }

  /** PageRank over the co-authorship graph (centrality of authors). The
    * co-edge list uses the same star construction as
    * [[coauthorComponents]] (symmetrized), trading exact clique weights for
    * linear edge growth — rank ordering within components is preserved for
    * hub detection while staying skew-proof.
    */
  def authorRank(authorOf: DataFrame, tol: Double = 0.001): DataFrame = {
    val spark = authorOf.sparkSession
    import spark.implicits._
    val membership = authorOf.select(col("dst").as("o"), col("src").as("m"))
    val star = starEdges(membership)
    val coedges = star.union(
      star.select(col("dst").as("src"), col("src").as("dst")))
    val authors = authorOf.select(col("src").as("uuid")).distinct()
    val g = buildGraph(authors, coedges)
    val pr = g.pageRank(tol).vertices.toDF("vid", "pagerank")
    authors.withColumn("vid", xxhash64(col("uuid")))
      .join(pr, "vid")
      .select(col("uuid").as("author_uuid"), col("pagerank"))
  }
}
