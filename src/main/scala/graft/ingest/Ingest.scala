package graft.ingest

import graft.enrich.CountryLinker
import graft.graph.GraphStore
import graft.report.Metrics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLI-equivalent ingestion pipeline — the Spark re-expression of the
  * reference's main entry point (`create_graph_from_doi.py:195-256,332-376`).
  *
  * The reference loops DOI-by-DOI issuing ~2+3·|authors| Bolt round-trips per
  * article; here the same semantics run as ONE batch dataflow:
  *
  *   doi list ─validate/dedup─ tracker
  *        └─ payloads (pre-fetched JSON dir; the HTTP fetch is outside the
  *           engine, reference get_metadata.py:40-87)
  *             └─ parse (G2/G3/F1/F5-F10, narrow)
  *                └─ J7 new-output anti-join ── outputs append
  *                └─ posexplode authors → J5/J9/J6 resolution → minted
  *                   authors append → J2 author_of MERGE
  *   then country enrichment (J4/J8/L3) and the metrics report (A2/A3).
  *
  * Run: sbt "runMain graft.ingest.Ingest <doiList> <payloadDir> <warehouse>"
  * where payloadDir holds {doi-with-slashes-stripped}.json files (the
  * reference's --write-metadata layout, get_metadata.py:29-38).
  */
object Ingest {

  /** One full ingestion run. Returns the metrics report (1 row). */
  def run(spark: SparkSession, store: GraphStore, doiList: DataFrame,
          payloads: DataFrame, countriesSeed: Option[DataFrame] = None,
          limit: Option[Int] = None, update: Boolean = false,
          citedByCountYear: Option[Int] = None): DataFrame = {

    // 1. validate + existence (tracker stays small: --limit default 50)
    val tracker0 = DoiOps.validate(doiList, limit)
    val tracker = DoiOps.markExisting(tracker0, store.nodeTable("outputs"))
      .cache()
    val ingest = DoiOps.toIngest(tracker, update)

    // 2. parse payloads for the to-ingest set (semi-join: payload table may
    //    hold anything; only this batch's DOIs flow on)
    val batch = payloads.join(ingest.select("doi").hint("broadcast"),
      Seq("doi"), "left_semi")
    val parsed = MetadataParser.parseEnvelope(batch,
      citedByCountYear = citedByCountYear).cache()

    // 3. outputs: J7 anti-join, deterministic uuids, append
    val newOut = EntityResolution.newOutputs(parsed, store.nodeTable("outputs"))
      .cache()
    store.upsertNodes("outputs", newOut, key = "doi")

    // 4. authors: fan out mentions (G3), resolve (J5/J9/J6), mint, append
    val mentions = newOut.select(col("doi"), col("uuid").as("output_uuid"),
        posexplode(col("authors")).as(Seq("mention_order", "a")))
      .select(col("doi"), col("output_uuid"), col("a.first_name"),
        col("a.last_name"), col("a.orcid"), col("a.rank"),
        col("mention_order").cast("long").as("mention_order"))
    val resolved = EntityResolution
      .resolveAuthors(mentions, store.nodeTable("authors")).cache()
    store.upsertNodes("authors", EntityResolution.mintedAuthors(resolved),
      key = "uuid")

    // 5. author_of edges (J2/S8)
    store.mergeEdges("author_of", EntityResolution.authorOfEdges(resolved))

    // 6. country enrichment (J4+J8, abstract then title, reference
    //    create_graph_from_doi.py:294-329). Uncapped variant = batch
    //    semantics; the CLI's LIMIT-1-per-country exists as
    //    CountryLinker.newLinksTop1PerCountry.
    countriesSeed.foreach(c => store.upsertNodes("countries", c, key = "id"))
    val countries = store.nodeTable("countries")
    val outputsNow = store.nodeTable("outputs")
    Seq("abstract", "title").foreach { f =>
      store.mergeEdges("refers_to", CountryLinker.newLinks(
        outputsNow, countries, store.edgeTable("refers_to"), f))
    }

    // 7. metrics (A2/A3) — enrich tracker with per-stage success flags
    val okDois = parsed.select("doi").distinct()
      .withColumn("openaire_metadata", lit(true))
    val report = Metrics.ingestionReport(
      tracker.join(okDois, Seq("doi"), "left_outer")
        .withColumn("openaire_metadata",
          coalesce(col("openaire_metadata"), lit(false)))
        .withColumn("ingestion_success",
          col("openaire_metadata") && col("valid_pattern")))
    report
  }

  def main(args: Array[String]): Unit = {
    val Array(doiListPath, payloadDir, warehouse) = args.take(3)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .appName("graft-ingest").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = new GraphStore(spark, warehouse)
    val doiList = DoiOps.readDoiList(spark, doiListPath)
    // payload dir: one {doi stripped of '/'}.json per DOI (S5/S6 layout)
    import spark.implicits._
    val payloads = spark.read.option("wholetext", "true").text(payloadDir)
      .withColumn("_file", input_file_name())
      .select(regexp_extract(col("_file"), "([^/]+)\\.json$", 1).as("file_key"),
        col("value").as("payload"))
    // file_key joins back to the tracker's filename key (F13)
    val keyed = DoiOps.validate(doiList)
      .withColumn("file_key", regexp_replace(col("doi"), "/", ""))
      .select("doi", "file_key").distinct()
      .join(payloads, Seq("file_key")).drop("file_key")

    val report = Ingest.run(spark, store, doiList, keyed)
    report.show(truncate = false)
    val violations = store.assertConstraints()
    println(s"constraint violations: $violations")
    println("nodes/authors=" + store.nodeTable("authors").count() +
      " nodes/outputs=" + store.nodeTable("outputs").count() +
      " edges/author_of=" + store.edgeTable("author_of").count() +
      " edges/refers_to=" + store.edgeTable("refers_to").count())
    spark.stop()
  }
}
