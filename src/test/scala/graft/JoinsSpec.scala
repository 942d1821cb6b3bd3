package graft

import java.sql.Timestamp

import graft.ops.{AsOfJoin, Joins, RangeJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("joins-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(min: Int) = new Timestamp(min * 60_000L)

  test("asofLeft matches latest right row at-or-before each left ts") {
    import spark.implicits._
    val quotes = Seq( // (user, ts, price)
      (1L, ts(0), 10.0), (1L, ts(10), 20.0), (1L, ts(20), 30.0),
      (2L, ts(5), 99.0))
      .toDF("user_id", "ts", "price")
    val trades = Seq( // (id, user, ts)
      (100L, 1L, ts(5)),   // -> 10.0 @ ts(0)
      (101L, 1L, ts(10)),  // inclusive: -> 20.0 @ ts(10)
      (102L, 1L, ts(25)),  // -> 30.0 @ ts(20)
      (103L, 2L, ts(4)),   // no prior quote -> null
      (104L, 3L, ts(9)))   // unknown key -> null
      .toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asofLeft(trades, quotes, Seq("user_id"), "ts",
      Seq("price"))
      .select("event_id", "asof_ts", "asof_price").collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)), Option(r.get(2)))))
      .toMap
    assert(got(100L) == ((Some(ts(0)), Some(10.0))))
    assert(got(101L) == ((Some(ts(10)), Some(20.0))))
    assert(got(102L) == ((Some(ts(20)), Some(30.0))))
    assert(got(103L) == ((None, None)))
    assert(got(104L) == ((None, None)))
    assert(got.size == 5) // every left row survives (left join)
  }

  test("asofLeftForward matches earliest right row at-or-after each left ts") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts(0), 10.0), (1L, ts(10), 20.0), (1L, ts(20), 30.0),
      (2L, ts(5), 99.0))
      .toDF("user_id", "ts", "price")
    val trades = Seq(
      (100L, 1L, ts(5)),   // -> 20.0 @ ts(10)
      (101L, 1L, ts(10)),  // inclusive: -> 20.0 @ ts(10)
      (102L, 1L, ts(25)),  // nothing after -> null
      (103L, 2L, ts(4)),   // -> 99.0 @ ts(5)
      (104L, 3L, ts(9)))   // unknown key -> null
      .toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asofLeftForward(trades, quotes, Seq("user_id"), "ts",
      Seq("price"))
      .select("event_id", "asof_ts", "asof_price").collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)), Option(r.get(2)))))
      .toMap
    assert(got(100L) == ((Some(ts(10)), Some(20.0))))
    assert(got(101L) == ((Some(ts(10)), Some(20.0))))
    assert(got(102L) == ((None, None)))
    assert(got(103L) == ((Some(ts(5)), Some(99.0))))
    assert(got(104L) == ((None, None)))
    assert(got.size == 5)
  }

  test("pointInInterval equals the brute-force range join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // longs spanning negative and positive domains, intervals of varied
    // length (0 to ~3 bins wide at binWidth=100), some degenerate
    val points = (1 to 300).map(i =>
      (i.toLong, (i % 5).toLong, rnd.nextInt(2000) - 1000L))
      .toDF("pid", "k", "t")
    val intervals = (1 to 80).map { i =>
      val s = rnd.nextInt(2000) - 1000L
      (i.toLong, (i % 5).toLong, s, s + rnd.nextInt(350) - 10L) // some end<start
    }.toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", binWidth = 100L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivs = intervals.as[(Long, Long, Long, Long)].collect()
    val brute = points.as[(Long, Long, Long)].collect().flatMap {
      case (pid, pk, t) =>
        ivs.collect {
          case (iid, ik, lo, hi) if ik == pk && t >= lo && t <= hi =>
            (pid, iid)
        }
    }.toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("intervalOverlap equals brute force with exactly one row per pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def mk(n: Int, pre: String, maxLen: Int) = (1 to n).map { i =>
      val s = rnd.nextInt(2000) - 1000L
      (i.toLong, (i % 4).toLong, s, s + rnd.nextInt(maxLen) - 10L)
    }
    // varied lengths (0 to several bins wide at binWidth=100), some
    // degenerate end<start rows that must be dropped
    val left = mk(120, "l", 450).toDF("lid", "k", "ls", "le")
    val right = mk(90, "r", 250).toDF("rid", "k2", "rs", "re")
      .withColumnRenamed("k2", "k")
    val rows = RangeJoin.intervalOverlap(left, right, Seq("k"),
      "ls", "le", "rs", "re", binWidth = 100L)
      .select("lid", "rid", "overlap_start", "overlap_end").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one row per overlapping pair — the first-shared-bin rule, no dedup
    assert(rows.length == rows.map(t => (t._1, t._2)).distinct.length)
    val rs = right.as[(Long, Long, Long, Long)].collect()
    val brute = left.as[(Long, Long, Long, Long)].collect().flatMap {
      case (lid, lk, ls, le) if le >= ls =>
        rs.toSeq.collect {
          case (rid, rk, s, e) if rk == lk && e >= s && ls <= e && s <= le =>
            (lid, rid, math.max(ls, s), math.min(le, e))
        }
      case _ => Seq.empty[(Long, Long, Long, Long)]
    }.toSet
    assert(rows.toSet == brute && brute.nonEmpty)
  }

  test("intervalOverlap rejects colliding non-key column names") {
    import spark.implicits._
    val a = Seq((1L, 0L, 1L, 2L)).toDF("id", "k", "s", "e")
    val b = Seq((2L, 0L, 1L, 2L)).toDF("id", "k", "s2", "e2")
    val err = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, b, Seq("k"), "s", "e", "s2", "e2", 10L)
    }
    assert(err.getMessage.contains("disjoint"))
  }

  test("pointInInterval handles timestamp bounds inclusively") {
    import spark.implicits._
    val clicks = Seq((1L, 1L, ts(30)), (2L, 1L, ts(0)), (3L, 1L, ts(31)))
      .toDF("click_id", "user_id", "t")
    val wins = Seq((10L, 1L, ts(0), ts(30))).toDF("win_id", "user_id", "s", "e")
    val got = RangeJoin.pointInInterval(clicks, wins, Seq("user_id"),
      "t", "s", "e", binWidth = 30L * 60 * 1000 * 1000)
      .select("click_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // both ends inclusive, 31min excluded
  }

  test("pointInInterval rejects mixed units (date point vs timestamp bounds)") {
    import spark.implicits._
    val points = Seq((1L, java.sql.Date.valueOf("2024-01-15")))
      .toDF("pid", "t")
    val wins = Seq((10L, ts(0), ts(30))).toDF("win_id", "s", "e")
    val err = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, wins, Seq.empty, "t", "s", "e",
        binWidth = 1000L)
    }
    assert(err.getMessage.contains("one unit"))
  }

  test("saltedJoin equals the plain join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail
    val big = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong)))
      .toDF("key", "payload")
    val small = (Seq(("hot", "H")) ++ (1 to 100).map(i => (s"k$i", s"V$i")))
      .toDF("key", "tag")
    val plain = big.join(small, Seq("key")).select("key", "payload", "tag")
      .collect().map(_.toString).sorted
    val salted = Joins.saltedJoin(big, small, "key", salts = 8)
      .select("key", "payload", "tag")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    // and the hot key really is spread across salts
    val spread = big.withColumn("_salt",
      pmod(xxhash64(struct(col("key"), col("payload"))), lit(8)))
      .filter(col("key") === "hot")
      .select("_salt").distinct().count()
    assert(spread == 8)
  }
}
