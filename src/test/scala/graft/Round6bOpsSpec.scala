package graft

import graft.ops.{Cdc, Profile, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 4: t-closeness, PMI collocations, snapshot diff,
  * random projection, triangle counts, clustering coefficient, k-core,
  * feature hashing, calibration bins, exact AUC, retrieval metrics,
  * deflate length.
  */
class Round6bOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("round6b-ops-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("tClosenessViolations: hand-computed exact TVD fractions") {
    import spark.implicits._
    // class A 10x/0y, B 6x/4y, C 4x/6y; global 20x/10y over N=30
    // TVD: A = 1/3, B = 1/15, C = 4/15 -> at t = 1/5 only A and C violate
    val rows =
      Seq.fill(10)(("A", "x")) ++
      (Seq.fill(6)(("B", "x")) ++ Seq.fill(4)(("B", "y"))) ++
      (Seq.fill(4)(("C", "x")) ++ Seq.fill(6)(("C", "y")))
    val df = rows.toDF("grp", "sens")
    val out = Profile.tClosenessViolations(df, Seq("grp"), "sens", 1, 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set("A", "C"))
    // A: present |10*30-20*10| = 100, absent-y mass (30-20)*10 = 100
    assert(out("A") == ((10L, 200L, 600L)))
    // C: |4*30-20*10| + |6*30-10*10| = 80 + 80
    assert(out("C") == ((10L, 160L, 600L)))
  }

  test("tClosenessViolations: null sensitive value is a value") {
    import spark.implicits._
    // E all-null sensitive, F all-x; each is TVD = 1/2 from global
    val df = (Seq.fill(4)(("E", null: String)) ++ Seq.fill(4)(("F", "x")))
      .toDF("grp", "sens")
    val out = Profile.tClosenessViolations(df, Seq("grp"), "sens", 1, 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // if the class-global join dropped the null key, E would vanish
    assert(out.keySet == Set("E", "F"))
    assert(out("E") == 32L && out("F") == 32L)
  }

  test("tClosenessViolations: reserved names and bad params rejected") {
    import spark.implicits._
    val df = Seq(("a", "b")).toDF("grp", "class_size")
    intercept[IllegalArgumentException] {
      Profile.tClosenessViolations(df, Seq("class_size"), "grp", 1, 5)
    }
    intercept[IllegalArgumentException] {
      Profile.tClosenessViolations(df, Seq("grp"), "grp", 1, 5)
    }
    intercept[IllegalArgumentException] {
      Profile.tClosenessViolations(df, Seq("grp"), "class_size", 1, 0)
    }
  }

  test("pmiCollocations: hand-computed bits and rank order") {
    import spark.implicits._
    // pairs: (a,b) x3, (b,a) x1, (b,c) x1 -> T=5; unigrams a=3 b=3 c=1
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, k = 10, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    // pmi(a,b) = log2(3*5/9) = log2(5/3) = pmi(b,c) = log2(1*5/3)
    assert(out.toSeq == Seq(
      ("a", "b", 3L, 0.736966),
      ("b", "c", 1L, 0.736966),
      ("b", "a", 1L, -0.847997)))
  }

  test("pmiCollocations: minCount prunes pairs, not the normalizer") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, k = 10, minCount = 2)
      .collect()
    // only (a,b) survives, but T stays 5 (pruning must not shift the
    // independence normalizer)
    assert(out.length == 1)
    assert(out.head.getDouble(3) == 0.736966)
  }

  test("snapshotDiff: all four statuses with null-safe comparison") {
    import spark.implicits._
    val old = Seq(
      (1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", null: String),
      (4L, "d", "s2")).toDF("doc_id", "text", "source")
    val neu = Seq(
      (1L, "a", "s1"), (2L, "B", "s1"), (3L, "c", "s3"),
      (5L, "e", "s1")).toDF("doc_id", "text", "source")
    val delta = Cdc.snapshotDiff(old, neu, Seq("doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2)))).toMap
    assert(delta == Map(
      2L -> (("changed", "text")),
      3L -> (("changed", "source")), // null -> value IS a change
      4L -> (("removed", "")),
      5L -> (("added", ""))))
    val full = Cdc.snapshotDiff(old, neu, Seq("doc_id"),
      includeUnchanged = true).collect()
    assert(full.length == 5)
    assert(full.find(_.getLong(0) == 1L).get.getString(1) == "unchanged")
  }

  test("snapshotDiff: multi-column change lists columns in input order") {
    import spark.implicits._
    val old = Seq((1L, "a", "s1")).toDF("doc_id", "text", "source")
    val neu = Seq((1L, "x", "s9")).toDF("doc_id", "text", "source")
    val r = Cdc.snapshotDiff(old, neu, Seq("doc_id")).collect().head
    assert(r.getString(1) == "changed" && r.getString(2) == "text,source")
  }

  test("snapshotDiff: reserved/missing columns rejected") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("doc_id", "status")
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(a, a, Seq("doc_id"))
    }
    val b = Seq((1L, "x")).toDF("doc_id", "text")
    val c = Seq((1L, "x")).toDF("doc_id", "other")
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(b, c, Seq("doc_id"), Seq("text"))
    }
    // a NON-compared reserved column must also be rejected — it would
    // survive into the join and make withColumn("status") ambiguous
    val d = Seq((1L, "x", "keep")).toDF("doc_id", "text", "status")
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(d, d, Seq("doc_id"), Seq("text"))
    }
  }

  test("randomProject: matches the rpSign fold; drops invalid vectors") {
    import spark.implicits._
    val v = Array(0.5f, -1.25f, 2.0f, 0.125f)
    val vecs = Seq(
      (1L, v), (2L, Array(1.0f, 2.0f)), (3L, null: Array[Float]))
      .toDF("vec_id", "embedding")
    val out = Similarity.randomProject(vecs, inDim = 4, outDim = 2,
      seed = "t").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // rows 2 (wrong length) and 3 (null) are dropped
    assert(out.keySet == Set((1L, 0), (1L, 1)))
    for (j <- 0 until 2) {
      val expected = (0 until 4).map(i =>
        Similarity.rpSign("t", i, j) * v(i).toDouble).sum
      assert(math.abs(out((1L, j)) - expected) < 1e-9)
    }
  }

  test("triangleCounts: known triangles; duplicates/direction/loops ignored") {
    import spark.implicits._
    // triangles {1,2,3} and {3,4,5}; (5,6) dangles; noise: dup edge,
    // reversed edge, self-loop
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 3L), (5L, 6L), (2L, 1L), (1L, 2L), (4L, 4L))
      .toDF("src", "dst")
    val out = graft.graph.GraphOps.triangleCounts(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("triangleCounts: K4 has 4 triangles, 3 per vertex") {
    import spark.implicits._
    val vs = Seq(1L, 2L, 3L, 4L)
    val e = (for (a <- vs; b <- vs if a < b) yield (a, b)).toDF("src", "dst")
    val out = graft.graph.GraphOps.triangleCounts(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == vs.map(_ -> 3L).toMap)
  }

  test("clusteringCoefficient: exact integer fractions, all vertices") {
    import spark.implicits._
    // triangle {1,2,3} plus pendant edge (3,4)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val out = graft.graph.GraphOps.clusteringCoefficient(e)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, 1L)), 2L -> ((2L, 1L, 1L)),
      3L -> ((3L, 1L, 3L)), 4L -> ((1L, 0L, 0L))))
  }

  test("retrievalMetrics: hits, recall base, first hit, zero-qrel query") {
    import spark.implicits._
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2)).toDF("query_id", "doc_id", "rank")
    // q1 judged {11, 99} (99 never retrieved); q3 judged but never ran
    val qrels = Seq((1L, 11L), (1L, 99L), (3L, 5L))
      .toDF("query_id", "doc_id")
    val out = graft.ops.Similarity.retrievalMetrics(ranked, qrels, k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, 2L)), // 2 judged, 1 hit in top-2, first at rank 2
      2L -> ((0L, 0L, 0L)))) // ran but nothing judged
  }

  test("retrievalMetrics: hit below k counts for MRR but not for @k") {
    import spark.implicits._
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 5))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 11L)).toDF("query_id", "doc_id")
    val r = graft.ops.Similarity.retrievalMetrics(ranked, qrels, k = 3)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 0L, 5L)))
  }

  test("kCore: multi-round peeling to the dense core") {
    import spark.implicits._
    // chain 5-4 into triangle {1,2,3}: round 1 peels 5, round 2 peels 4,
    // fixpoint is the triangle (every vertex core-degree 2)
    val e = Seq((5L, 4L), (4L, 3L), (1L, 2L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val core2 = graft.graph.GraphOps.kCore(e, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // no 3-core exists -> empty
    assert(graft.graph.GraphOps.kCore(e, k = 3).count() == 0)
    // path graph fully peels under k=2
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(graft.graph.GraphOps.kCore(path, k = 2).count() == 0)
  }

  test("deflateLen: repetition compresses, kernel == expression == SQL") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders off across the wide river delta toward distant hills"
    val boiler = "na" * 60 // same length class, maximally repetitive
    val k = graft.functions.CorpusKernels.deflateLen _
    assert(k(prose) == k(prose)) // deterministic
    assert(k(boiler) < k(prose) / 2) // repetition compresses hard
    assert(k("") == 2) // raw deflate empty-stream terminator
    // expression output matches the kernel, nulls propagate
    val out = Seq((1L, prose), (2L, boiler), (3L, null: String))
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.CorpusFunctions.deflate_len(col("text")).as("dl"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out == Map(1L -> k(prose), 2L -> k(boiler), 3L -> -1))
  }

  test("hashFeatures: md5 buckets and counts") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.hashFeatures(docs, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    def bucket(term: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(term.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % 16).toInt
    }
    assert(out == Map((1L, bucket("a")) -> 2L, (1L, bucket("b")) -> 1L))
  }

  test("calibrationBins: clamping, null/NaN score drop, null label negative") {
    import spark.implicits._
    val scored = Seq(
      (0.05, java.lang.Boolean.TRUE),   // bin 0
      (1.0, java.lang.Boolean.TRUE),    // clamps into bin 9
      (-0.2, java.lang.Boolean.FALSE),  // clamps into bin 0
      (0.95, null: java.lang.Boolean),  // bin 9, counts as negative
      (Double.NaN, java.lang.Boolean.TRUE) // dropped by the operator —
        // would otherwise cast-floor to 0 and silently inflate bin 0
    ).toDF("score", "label")
    val out = graft.ops.CorpusOps.calibrationBins(scored, "score", "label")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map(0 -> ((2L, 1L)), 9 -> ((2L, 1L))))
  }

  test("aucExact: perfect, inverted, and tied separations") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Boolean)]): (Long, Long, Long, Long) = {
      val r = graft.ops.CorpusOps.aucExact(
        rows.toDF("score", "label"), "score", "label").collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // perfect: every positive outscores every negative -> AUC = 1
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false)))
      == ((2L, 2L, 8L, 8L)))
    // inverted -> AUC = 0
    assert(auc(Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false)))
      == ((2L, 2L, 0L, 8L)))
    // single tie -> AUC = 1/2 via the midrank
    assert(auc(Seq((0.5, true), (0.5, false))) == ((1L, 1L, 1L, 2L)))
  }

  test("rpSign: deterministic, seed- and position-sensitive, balanced-ish") {
    val s = for (i <- 0 until 16; j <- 0 until 16)
      yield Similarity.rpSign("rp", i, j)
    assert(s == (for (i <- 0 until 16; j <- 0 until 16)
      yield Similarity.rpSign("rp", i, j)))
    assert(s.toSet == Set(1, -1)) // both signs occur
    assert(Similarity.rpSign("a", 0, 0) * Similarity.rpSign("a", 0, 0) == 1)
  }
}
