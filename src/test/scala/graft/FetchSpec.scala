package graft

import java.nio.file.Files

import graft.ingest.Fetch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Live-fetch stage with an offline fake client: per-partition client
  * init, miss handling, and the cache-aware path (serve hits, fetch
  * misses, persist fresh payloads).
  */
class FetchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("fetch-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // fake transport: deterministic payload per DOI, one permanent 404
  private val fakeClient: () => String => Option[String] = () => {
    doi: String =>
      if (doi.endsWith("missing")) None
      else Some(s"""{"doi":"$doi","n":${doi.length}}""")
  }

  test("fetchPayloads runs the injected client and flags misses") {
    import spark.implicits._
    val dois = Seq("10.1/a", "10.1/b", "10.1/missing").toDF("doi")
    val got = Fetch.fetchPayloads(dois, fakeClient).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(got == Set(
      ("10.1/a", """{"doi":"10.1/a","n":6}""", true),
      ("10.1/b", """{"doi":"10.1/b","n":6}""", true),
      ("10.1/missing", null, false)))
  }

  test("fetchCached serves hits from cache and persists fresh fetches") {
    import spark.implicits._
    val cacheDir = Files.createTempDirectory("fetch-cache").toString + "/c"

    // cold cache: everything requested is fetched, misses drop out
    val r1 = Fetch.fetchCached(Seq("10.1/a", "10.1/missing").toDF("doi"),
      cacheDir, fakeClient)
    assert(r1.collect().map(_.getString(0)).toSet == Set("10.1/a"))

    // warm cache: 10.1/a is served from disk (client that would give a
    // DIFFERENT payload proves it was not re-fetched), 10.1/b is fetched
    val changedClient: () => String => Option[String] =
      () => (doi: String) => Some(s"""{"refetched":"$doi"}""")
    val r2 = Fetch.fetchCached(Seq("10.1/a", "10.1/b").toDF("doi"),
      cacheDir, changedClient)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r2("10.1/a") == """{"doi":"10.1/a","n":6}""") // cache hit
    assert(r2("10.1/b") == """{"refetched":"10.1/b"}""") // fresh fetch
    // and the fresh fetch is now cached too
    val r3 = Fetch.fetchCached(Seq("10.1/b").toDF("doi"),
      cacheDir, fakeClient).head()
    assert(r3.getString(1) == """{"refetched":"10.1/b"}""")
  }
}
