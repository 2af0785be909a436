package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, RangeJoin}

class AsofRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Right: per-key "quotes" (key, ts, price, note). Note is null at ts=30
  // on purpose: the carried match must preserve that null, not back-fill 1.0.
  private val quotes = Seq(
    (1L, 10L, 1.0, Option("a")),
    (1L, 30L, 3.0, Option.empty[String]),
    (2L, 20L, 2.0, Option("b"))
  ).toDF("k", "qts", "price", "note")

  private val trades = Seq(
    (1L, 5L, "t0"),   // before any quote → no match
    (1L, 10L, "t1"),  // equal ts → inclusive match at 10
    (1L, 29L, "t2"),  // latest <= 29 is 10
    (1L, 35L, "t3"),  // latest is 30 (null note preserved)
    (2L, 100L, "t4"), // key 2 matches 20
    (3L, 50L, "t5")   // key with no quotes → no match
  ).toDF("k", "tts", "tag")

  test("leftAsof matches the latest right row at or before each left ts") {
    val out = AsofJoin.leftAsof(trades, quotes, "k", "tts", "qts")
      .select("tag", "asof_ts", "price", "note")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("t0") == ((None, None, None)))
    assert(out("t1") == ((Some(10L), Some(1.0), Some("a"))))
    assert(out("t2") == ((Some(10L), Some(1.0), Some("a"))))
    assert(out("t3") == ((Some(30L), Some(3.0), None))) // null note kept
    assert(out("t4") == ((Some(20L), Some(2.0), Some("b"))))
    assert(out("t5") == ((None, None, None)))
  }

  test("leftAsof tolerance nulls out stale matches") {
    val out = AsofJoin.leftAsof(trades, quotes, "k", "tts", "qts",
      tolerance = Some(10L))
      .select("tag", "asof_ts").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t2").isEmpty)      // 29-10=19 > 10
    assert(out("t1") == Some(10L)) // 0 <= 10
    assert(out("t4").isEmpty)      // 100-20=80 > 10
  }

  test("leftAsofForward matches the earliest right row at or after left ts") {
    val out = AsofJoin.leftAsofForward(trades, quotes, "k", "tts", "qts")
      .select("tag", "asof_ts", "price", "note")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("t0") == ((Some(10L), Some(1.0), Some("a")))) // next is 10
    assert(out("t1") == ((Some(10L), Some(1.0), Some("a")))) // inclusive
    assert(out("t2") == ((Some(30L), Some(3.0), None)))      // next is 30
    assert(out("t3") == ((None, None, None)))   // nothing after 35
    assert(out("t4") == ((None, None, None)))   // nothing after 100
    assert(out("t5") == ((None, None, None)))
    // original timestamps come back un-negated
    val ts = AsofJoin.leftAsofForward(trades, quotes, "k", "tts", "qts")
      .select("tts").as[Long].collect().toSet
    assert(ts == Set(5L, 10L, 29L, 35L, 100L, 50L))
  }

  test("leftAsofForward tolerance bounds the look-ahead") {
    val out = AsofJoin.leftAsofForward(trades, quotes, "k", "tts", "qts",
      tolerance = Some(3L))
      .select("tag", "asof_ts").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t0").isEmpty)      // 10-5=5 > 3
    assert(out("t1") == Some(10L)) // 0 <= 3
    assert(out("t2") == Some(30L)) // 30-29=1 <= 3
  }

  test("leftAsof preserves every left row exactly once") {
    val out = AsofJoin.leftAsof(trades, quotes, "k", "tts", "qts")
    assert(out.count() == 6)
    assert(out.select("tag").distinct().count() == 6)
  }

  test("pointInInterval joins exactly the containing intervals") {
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 99L))
      .toDF("pid", "p")
    val ivs = Seq((10L, 0L, 10L), (20L, 8L, 30L), (30L, 50L, 60L))
      .toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L)))
  }

  test("pointInInterval handles negative values with floor bucketing") {
    val pts = Seq((1L, -5L), (2L, -14L)).toDF("pid", "p")
    val ivs = Seq((10L, -15L, -3L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L)))
  }

  test("pointInInterval drops intervals wider than the bucket cap") {
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((10L, 0L, 1000000L), (20L, 0L, 10L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 7L,
      maxBucketsPerInterval = 100)
      .select("iid").as[Long].collect().toSet
    assert(out == Set(20L)) // the mega-interval is dropped, not exploded
  }

  test("intervalOverlap matches brute force and emits each pair once") {
    val rng = new scala.util.Random(7)
    val ls = (0 until 60).map(i =>
      (i.toLong, rng.nextInt(200).toLong) match {
        case (id, lo) => (id, lo, lo + rng.nextInt(40).toLong)
      })
    val rs = (100 until 160).map(i =>
      (i.toLong, rng.nextInt(200).toLong) match {
        case (id, lo) => (id, lo, lo + rng.nextInt(40).toLong)
      })
    val lDf = ls.toDF("lid", "l_lo", "l_hi")
    val rDf = rs.toDF("rid", "r_lo", "r_hi")
    val out = RangeJoin.intervalOverlap(lDf, rDf, "l_lo", "l_hi",
      "r_lo", "r_hi", bucketWidth = 16L)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    val brute = for {
      (lid, llo, lhi) <- ls
      (rid, rlo, rhi) <- rs
      if llo <= rhi && rlo <= lhi
    } yield (lid, rid)
    assert(out.toSet == brute.toSet)
    assert(out.size == out.distinct.size,
      "a pair overlapping several buckets must be emitted exactly once")
  }

  test("intervalOverlap handles negative coordinates and the bucket cap") {
    val l = Seq((1L, -20L, -5L)).toDF("lid", "l_lo", "l_hi")
    val r = Seq((10L, -8L, 3L), (20L, -100L, 100L)).toDF("rid", "r_lo", "r_hi")
    val out = RangeJoin.intervalOverlap(l, r, "l_lo", "l_hi",
      "r_lo", "r_hi", bucketWidth = 7L, maxBucketsPerInterval = 10)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L))) // mega-interval 20 dropped loudly
  }

  test("range join plans a shuffled equi-join, not a nested loop") {
    val pts = spark.range(100).select(col("id").as("p"))
    val ivs = spark.range(10).select(col("id").as("iid"),
      (col("id") * 10).as("lo"), (col("id") * 10 + 5).as("hi"))
    val plan = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
