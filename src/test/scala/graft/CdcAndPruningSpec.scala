package graft

import java.sql.Timestamp

import graft.ops.{Cdc, Dedup, Joins, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 additions: bloom-pruned join, duplicate-span detection, int8
  * quantization, CDC (SCD2 + point-in-time snapshot).
  */
class CdcAndPruningSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("cdc-pruning-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(min: Int) = new Timestamp(min * 60_000L)

  test("bloomPrunedJoin equals the plain join and actually probes a bloom") {
    import spark.implicits._
    val fact = (1 to 5000).map(i => (i.toLong % 500, i.toLong))
      .toDF("k", "payload")
    val dim = (1 to 25).map(i => (i.toLong * 7, s"d$i")).toDF("k", "tag")
    val pruned = Joins.bloomPrunedJoin(fact, dim, "k", expectedItems = 100L)
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "tag")
      .collect().map(_.toString).sorted
    assert(pruned.select("k", "payload", "tag")
      .collect().map(_.toString).sorted.sameElements(plain))
    assert(plain.nonEmpty)
    // the fact side really is probed before the join
    assert(pruned.queryExecution.executedPlan.toString
      .toLowerCase.contains("might_contain"))
  }

  test("bloomPrunedJoin rejects result-changing join types") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "v")
    val err = intercept[IllegalArgumentException] {
      Joins.bloomPrunedJoin(df, df.select(col("k"), col("v").as("w")),
        "k", joinType = "left_outer")
    }
    assert(err.getMessage.contains("inner/left_semi"))
  }

  test("duplicateSpans counts every duplicated k-gram exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefgh"),  // shares "cdefg"-window grams with doc 2
      (2L, "xxabcdefg"),
      (3L, "zzzzzzzz"),  // internal repeats: zzzzz x4 within one doc
      (4L, "tiny")       // below k, contributes nothing
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, k = 5, minOcc = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same corpus
    val grams = Seq(1L -> "abcdefgh", 2L -> "xxabcdefg", 3L -> "zzzzzzzz")
      .flatMap { case (id, t) =>
        (0 to t.length - 5).map(p => (id, t.substring(p, p + 5)))
      }
    val expect = grams.groupBy(_._2)
      .map { case (g, occ) =>
        (g, occ.map(_._1).distinct.size.toLong, occ.size.toLong)
      }
      .filter(_._3 >= 2).toSet
    assert(got == expect)
    assert(expect.exists(_._1 == "zzzzz")) // intra-doc repeats counted
    assert(expect.exists(t => t._1 == "abcde" && t._2 == 2L))
  }

  test("duplicateSpanRanges merges overlapping duplicated grams into maximal spans") {
    import spark.implicits._
    // docs 1 and 2 share "ABCDEFGHIJ" (10 chars) at different offsets;
    // doc 1 additionally shares "QRSTUVWXYZ" with doc 3, far from the
    // first span -> two distinct islands in doc 1
    val docs = Seq(
      (1L, "ABCDEFGHIJ..padding..QRSTUVWXYZ"),
      (2L, "zzABCDEFGHIJzz"),
      (3L, "QRSTUVWXYZtail")
    ).toDF("doc_id", "text")
    val k = 5
    val got = Dedup.duplicateSpanRanges(docs, k = k, minOcc = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // brute force: duplicated k-gram starts, merged when <= k apart
    val texts = Map(1L -> "ABCDEFGHIJ..padding..QRSTUVWXYZ",
      2L -> "zzABCDEFGHIJzz", 3L -> "QRSTUVWXYZtail")
    val all = texts.toSeq.flatMap { case (id, t) =>
      (0 to t.length - k).map(p => (id, p + 1L, t.substring(p, p + k)))
    }
    val hotG = all.groupBy(_._3).filter(_._2.size >= 2).keySet
    val expect = all.filter(g => hotG(g._3)).groupBy(_._1).flatMap {
      case (id, poss) =>
        val ps = poss.map(_._2).sorted
        val islands = ps.tail.foldLeft(List(List(ps.head))) { (acc, p) =>
          if (p - acc.head.head <= k) (p :: acc.head) :: acc.tail
          else List(p) :: acc
        }
        islands.map(is => (id, is.min, is.max + k - 1, is.max + k - is.min))
    }.toSet
    assert(got == expect)
    assert(got.count(_._1 == 1L) == 2) // doc 1 has two separate spans
  }

  test("cutDuplicateSpans keeps exactly the first occurrence of each dup span") {
    import spark.implicits._
    val k = 5
    val docs = Seq(
      (1L, "HELLOworldHELLO"), // intra-doc dup: 2nd HELLO cut
      (2L, "xxHELLOxx"),       // inter-doc dup: cut (owner is doc 1 pos 1)
      (3L, "unique text here"),
      (4L, "tiny")
    ).toDF("doc_id", "text")
    val got = Dedup.cutDuplicateSpans(docs, k = k, minOcc = 2)
      .select("doc_id", "text_deduped", "n_spans_cut")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got(1L) == (("HELLOworld", 1L)))
    assert(got(2L) == (("xxxx", 1L)))
    assert(got(3L) == (("unique text here", 0L)))
    assert(got(4L) == (("tiny", 0L)))
  }

  test("cutDuplicateSpans matches a brute-force cut on random corpora") {
    import spark.implicits._
    val k = 4
    val rnd = new scala.util.Random(23)
    (1 to 3).foreach { trial =>
      val texts = (1L to 10L).map { id =>
        val len = 3 + rnd.nextInt(20)
        (id, Seq.fill(len)("abc" (rnd.nextInt(3))).mkString)
      }
      val got = Dedup.cutDuplicateSpans(texts.toDF("doc_id", "text"),
        k = k, minOcc = 2)
        .select("doc_id", "text_deduped")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // brute force: owner per gram = min (doc, pos); cut merged islands
      val grams = texts.flatMap { case (id, t) =>
        if (t.length >= k) (0 to t.length - k).map(p => (id, p + 1, t.substring(p, p + k)))
        else Seq.empty
      }
      val owners = grams.groupBy(_._3).collect {
        case (g, occ) if occ.size >= 2 => g -> occ.map(o => (o._1, o._2)).min
      }.toMap
      val expect = texts.map { case (id, t) =>
        val cuts = grams.collect {
          case (d, p, g) if d == id && owners.contains(g) &&
            owners(g) != ((d, p)) => p
        }.distinct.sorted
        if (cuts.isEmpty) id -> t
        else {
          // merge islands (gap <= k), then cut [s, e=lastpos+k-1]
          val islands = scala.collection.mutable.ListBuffer[(Int, Int)]()
          var s0 = cuts.head; var last = cuts.head
          for (p <- cuts.tail) {
            if (p - last > k) { islands += ((s0, last + k - 1)); s0 = p }
            last = p
          }
          islands += ((s0, last + k - 1))
          val sb = new StringBuilder
          var cur = 1
          islands.foreach { case (s, e) =>
            sb.append(t.substring(cur - 1, s - 1)); cur = e + 1
          }
          sb.append(t.substring(cur - 1))
          id -> sb.toString
        }
      }.toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("duplicateSpans matches brute force on random corpora incl. length boundaries") {
    import spark.implicits._
    val k = 4
    val rnd = new scala.util.Random(13)
    (1 to 5).foreach { trial =>
      // tiny alphabet -> duplicates are common; lengths sweep k-1/k/k+1
      val texts = (1L to 12L).map { id =>
        val len = Seq(k - 1, k, k + 1, k + 3, 2 * k, 5 * k)(rnd.nextInt(6))
        (id, Seq.fill(len)("ab" (rnd.nextInt(2))).mkString)
      }
      val got = Dedup.duplicateSpans(texts.toDF("doc_id", "text"),
        k = k, minOcc = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val grams = texts.flatMap { case (id, t) =>
        if (t.length >= k) (0 to t.length - k).map(p => (id, t.substring(p, p + k)))
        else Seq.empty
      }
      val expect = grams.groupBy(_._2).collect {
        case (g, occ) if occ.size >= 2 =>
          (g, occ.map(_._1).distinct.size.toLong, occ.size.toLong)
      }.toSet
      assert(got == expect, s"trial $trial")
    }
  }

  test("quantizeInt8 bounds reconstruction error by scale/2 per dimension") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (1 to 50).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))) :+
      (99L, Array.fill(16)(0.25f)) // constant vector: scale 0
    val out = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding"))
      .select("vec_id", "embedding", "codes", "q_min", "q_scale")
      .collect()
    out.foreach { r =>
      val v = r.getSeq[Float](1)
      val codes = r.getSeq[Int](2)
      val (mn, sc) = (r.getDouble(3), r.getDouble(4))
      assert(codes.forall(c => c >= 0 && c <= 255))
      if (sc == 0d) assert(codes.forall(_ == 0))
      else v.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x.toDouble - (mn + c * sc)) <= sc / 2 + 1e-12)
      }
    }
    assert(out.length == 51)
  }

  test("scd2 chains versions per key with seq tiebreak") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(10), "b"),
      (3L, 1L, ts(10), "c"), // same ts as seq 2: seq order decides
      (4L, 2L, ts(5), "x"))
      .toDF("event_id", "user_id", "ts", "v")
    val got = Cdc.scd2(log, Seq("user_id"), "ts", "event_id")
      .select("event_id", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getTimestamp(1), Option(r.getTimestamp(2)), r.getBoolean(3))))
      .toMap
    assert(got(1L) == ((ts(0), Some(ts(10)), false)))
    assert(got(2L) == ((ts(10), Some(ts(10)), false))) // closed by seq 3
    assert(got(3L) == ((ts(10), None, true)))
    assert(got(4L) == ((ts(5), None, true)))
  }

  test("scd2 intervals partition each key's timeline (random logs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val log = (1L to 300L).map { id =>
      (id, rnd.nextInt(8).toLong, ts(rnd.nextInt(50)), s"v$id")
    }.toDF("event_id", "user_id", "ts", "v")
    val rows = Cdc.scd2(log, Seq("user_id"), "ts", "event_id")
      .select("user_id", "event_id", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (_, vs) =>
      // exactly one current version per key
      assert(vs.count(_._5) == 1)
      // intervals chain: sorted by (from, event_id), each valid_to equals
      // the next version's valid_from; only the last is open
      val chain = vs.sortBy(v => (v._3.getTime, v._2))
      chain.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
      assert(chain.last._4.isEmpty)
    }
    assert(rows.length == 300)
  }

  test("snapshotAt returns latest pre-asOf version and drops tombstones") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, ts(0), "upsert"), (2L, 1L, ts(10), "upsert"),
      (3L, 1L, ts(30), "upsert"),  // after asOf: invisible
      (4L, 2L, ts(5), "upsert"), (5L, 2L, ts(15), "delete"), // tombstoned
      (6L, 3L, ts(40), "upsert")) // entirely after asOf
      .toDF("event_id", "user_id", "ts", "op")
    val got = Cdc.snapshotAt(log, Seq("user_id"), "ts", "event_id",
      asOf = lit(ts(20)), isDelete = col("op") === "delete")
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L)) // user 2 deleted, user 3 not yet born
  }
}
