package graft.ingest

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Live metadata-fetch stage (S3/S4) — the distributed analogue of the
  * reference's per-DOI HTTP loop (`get_metadata.py:40-87`) with its
  * requests-cache layer (S5, `create_graph_from_doi.py:49-57`).
  *
  * The HTTP client itself is INJECTED (`clientFactory`): one client per
  * partition (connection reuse, politeness state), one call per DOI, so
  * the engine stays testable offline and the transport (OpenAire/OpenAlex
  * REST, auth, rate limits) is a deployment concern. This is deliberately
  * a `mapPartitions` stage — the one imperative seam in the pipeline —
  * because a remote side-effecting call is not expressible as a Catalyst
  * plan; everything before (which DOIs to fetch) and after (parsing,
  * joins) stays declarative.
  *
  * Scale notes: fetch parallelism = partition count, so `repartition(n)`
  * on the miss set is the rate-limit lever; the iterator is consumed
  * lazily (no per-partition buffering of payloads).
  */
object Fetch {

  /** One row per requested DOI: payload + success flag. */
  case class Fetched(doi: String, payload: String, fetch_ok: Boolean)

  /** Run the injected client over every DOI, one client per partition.
    *
    * @param clientFactory builds the per-partition client: DOI =>
    *   Some(payloadJson) on success, None on a miss/HTTP failure. Created
    *   ONCE per partition — put connection pools and auth there.
    */
  def fetchPayloads(dois: DataFrame,
                    clientFactory: () => String => Option[String]): DataFrame = {
    val spark = dois.sparkSession
    import spark.implicits._
    dois.select(col("doi")).as[String]
      .mapPartitions { it =>
        val client = clientFactory() // per-partition init (S3: one session)
        it.map { doi =>
          client(doi) match {
            case Some(p) => Fetched(doi, p, fetch_ok = true)
            case None => Fetched(doi, null, fetch_ok = false)
          }
        }
      }(Encoders.product[Fetched])
      .toDF()
  }

  /** Cache-aware fetch (S5): serve hits from the payload cache dir, fetch
    * only the misses, persist fresh payloads back into the cache (the
    * reference's requests-cache TTL behavior, minus TTL — parquet-era
    * caches are pruned by the cache dir's retention policy).
    *
    * @return (doi, payload) covering every requested DOI that could be
    *   served or fetched
    */
  def fetchCached(dois: DataFrame, cacheDir: String,
                  clientFactory: () => String => Option[String]): DataFrame = {
    val spark = dois.sparkSession
    val wanted = dois.select("doi").distinct()
      .withColumn("file_key", regexp_replace(col("doi"), "/", ""))
    val dirPath = new org.apache.hadoop.fs.Path(cacheDir)
    val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    val cached =
      if (fs.exists(dirPath))
        spark.read.option("wholetext", "true").text(cacheDir)
          .withColumn("_file", input_file_name())
          .select(regexp_extract(col("_file"), "([^/]+)\\.json$", 1)
            .as("file_key"), col("value").as("payload"))
          .join(wanted, Seq("file_key"))
          .select("doi", "payload")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doi",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("payload",
            org.apache.spark.sql.types.StringType))))
    val misses = wanted.select("doi").join(cached, Seq("doi"), "left_anti")
    val fetched = fetchPayloads(misses, clientFactory)
      .filter(col("fetch_ok")).select("doi", "payload")
      // the fetch is side-effecting: evaluate it exactly once, then both
      // the cache write and the union read the materialized result
      .localCheckpoint(true)
    Ingest.writeMetadata(fetched, cacheDir)
    cached.unionByName(fetched)
  }
}
