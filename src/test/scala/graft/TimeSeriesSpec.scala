package graft

import org.apache.spark.sql.functions._

import graft.llm.{Corpus, Sampling}
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("zscore flags the outlier and leaves constant series null") {
    // series A: nine 10.00s and one 100.00 (clear outlier);
    // series B: constant → null std/z, flag false; series C: one sample
    val df = ((1 to 9).map(i => (i.toLong, "A", 10.00)) ++
      Seq((10L, "A", 100.00), (11L, "B", 5.00), (12L, "B", 5.00),
        (13L, "C", 7.00)))
      .toDF("id", "series", "value")
    val out = TimeSeries.zscore(df, Seq("series"), "value",
        threshold = 2.0)
      .select("id", "zscore", "is_anomaly")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), r.getBoolean(2)))).toMap
    assert(out(10L)._2, "the 100.0 sample must flag")
    assert(out(10L)._1.exists(_.asInstanceOf[Double] > 2.8))
    assert((1L to 9L).forall(!out(_)._2))
    assert(out(11L) == ((None, false)) && out(13L) == ((None, false)))
    // mean/std come from exact decimal sums: avg(A) is exactly 19.0
    val a = TimeSeries.zscore(df, Seq("series"), "value", 2.0)
      .filter($"series" === "A").select("series_avg", "series_std")
      .head()
    assert(a.getDouble(0) == 19.0)
    assert(math.abs(a.getDouble(1) - 28.4604989415154) < 1e-9)
  }

  test("gapfill interpolates interior buckets and emits heads as-is") {
    // one series, step 10: observations at 0 (v=1.0) and 30 (v=4.0) →
    // fills at 10 (2.0) and 20 (3.0); lone series D emits only itself
    val df = Seq(("s", 0L, 1.0), ("s", 30L, 4.0), ("d", 5L, 9.0))
      .toDF("series", "ts_us", "value")
    val out = TimeSeries.gapfill(df, Seq("series"), "ts_us", "value", 10L)
      .select("series", "bucket", "value", "filled")
      .as[(String, Long, Double, Boolean)].collect().toSet
    assert(out == Set(
      ("s", 0L, 1.0, false), ("s", 10L, 2.0, true),
      ("s", 20L, 3.0, true), ("s", 30L, 4.0, false),
      ("d", 0L, 9.0, false)))
  }

  test("gapfill max-downsamples multiple observations in one bucket") {
    val df = Seq(("s", 0L, 1.0), ("s", 3L, 7.0), ("s", 9L, 2.0))
      .toDF("series", "ts_us", "value")
    val out = TimeSeries.gapfill(df, Seq("series"), "ts_us", "value", 10L)
      .as[(String, Long, Double, Boolean)].collect().toSet
    assert(out == Set(("s", 0L, 7.0, false)))
  }

  test("weighted sample prefers heavy rows and is add-stable") {
    val rows = (1 to 400).map(i =>
      (i.toLong, if (i <= 200) 1L else 100L)) // half light, half heavy
    val df = rows.toDF("id", "w")
    val picked = Sampling.weighted(df, "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(picked.size == 50)
    val heavy = picked.count(_ > 200)
    assert(heavy >= 40, s"100× weights should dominate the sample: $heavy")
    // determinism + add-stability: re-running and adding rows never
    // reshuffles previously-ranked priorities (pure function of id)
    val again = Sampling.weighted(df, "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(again == picked)
    val more = Sampling.weighted(
      (rows ++ Seq((401L, 1000000L))).toDF("id", "w"), "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert((picked -- more).size <= 1,
      "one new row displaces at most one selected row")
  }

  test("rollingMean averages the trailing TIME window across gaps") {
    // step 10, 3-step window (range -20..0). Series s: buckets 0, 10, 30.
    // At bucket 30 the frame is [10, 30] → buckets 10 and 30 only — a
    // ROWS frame would wrongly reach back to bucket 0 across the gap.
    val df = Seq(("s", 0L, 1.00), ("s", 5L, 3.00), // both in bucket 0
      ("s", 10L, 6.00), ("s", 30L, 10.00))
      .toDF("series", "ts_us", "value")
    val m = TimeSeries.rollingMean(df, Seq("series"), "ts_us", "value",
        stepMicros = 10L, windowSteps = 3)
      .select("bucket", "window_n", "moving_avg")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(0L) == ((2L, 2.0)))          // (1+3)/2
    assert(m(10L)._1 == 3L)               // buckets 0 and 10 in frame
    assert(math.abs(m(10L)._2 - 3.333333) < 1e-9)
    assert(m(30L) == ((2L, 8.0)))         // (6+10)/2 — bucket 0 aged out
  }

  test("curriculum buckets tier by score within group; topK curates") {
    val df = Seq(
      (1L, "g", 0.9), (2L, "g", 0.8), (3L, "g", 0.7), (4L, "g", 0.6),
      (5L, "h", 0.5), (6L, "h", 0.5)) // tie → id order
      .toDF("id", "grp", "score")
    val cur = Sampling.curriculum(df, "grp", "score", "id", buckets = 2)
      .select("id", "curriculum_bucket").as[(Long, Int)].collect().toMap
    assert(cur(1L) == 1 && cur(2L) == 1 && cur(3L) == 2 && cur(4L) == 2)
    assert(cur(5L) == 1 && cur(6L) == 2)
    val top = Sampling.topKPerGroup(df, "grp", "score", "id", k = 1)
      .select("id").as[Long].collect().toSet
    assert(top == Set(1L, 5L))
    // global variant: quantile thresholds + map-side assign, bucket 1 =
    // highest tier; 8 distinct scores into 4 buckets of 2
    val g = (1 to 8).map(i => (i.toLong, i / 10.0)).toDF("id", "score")
    val gb = Sampling.curriculumGlobal(g, "score", buckets = 4)
      .select("id", "curriculum_bucket").as[(Long, Int)].collect().toMap
    assert(gb(8L) == 1 && gb(7L) == 1 && gb(1L) == 4 && gb(2L) == 4)
    assert((1 to 8).map(i => gb(i.toLong)).toSet == Set(1, 2, 3, 4))
  }

  test("cohort retention counts users per (cohort, offset) cell") {
    // step 10. u1 first at 0, active at 0, 10, 30 → offsets 0, 1, 3.
    // u2 first at 10, active at 10 (twice — must not double count) and 20.
    val ev = Seq((1L, 0L), (1L, 12L), (1L, 33L), (2L, 15L), (2L, 17L),
      (2L, 25L)).toDF("user_id", "ts_us")
    val out = graft.operators.Cohorts.retention(ev, "user_id", "ts_us", 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (10L, 0L, 1L), (10L, 1L, 1L)))
  }

  test("char entropy: uniform chars = ln(k), constant run = 0") {
    val df = Seq((1L, "aaaa"), (2L, "abab"), (3L, "")).toDF("doc_id", "text")
    val out = Corpus.charEntropy(df, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((4L, 0.0)))
    assert(math.abs(out(2L)._2 - math.log(2)) < 1e-6)
    assert(!out.contains(3L), "empty docs have no distribution")
  }

  test("ngram doc-freq ranks shared shingles above unique ones") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown dog sits"),
      (3L, "the quick brown cat naps over the quick brown cat"))
      .toDF("doc_id", "text")
    val top = Corpus.ngramDocFreqTopK(docs, "text", "doc_id", n = 3, k = 2)
      .as[(String, Long)].collect()
    // "the quick brown" in all 3 docs (distinct per doc despite doc 3's
    // repeat); tie group at 1 broken alphabetically
    assert(top(0) == (("the quick brown", 3L)))
    assert(top(1)._2 == 1L)
  }

  test("ohlc buckets, orders open/close, and skips null values") {
    // bucket [0,10): events at ts 1 (v=5.0), 3 (v=9.0), 7 (v=2.0), plus a
    // null at ts 0 that must not count; bucket [10,20): single event
    val df = Seq(
      ("s", 0L, "e0", None: Option[Double]),
      ("s", 1L, "e1", Some(5.0)), ("s", 3L, "e2", Some(9.0)),
      ("s", 7L, "e3", Some(2.0)), ("s", 12L, "e4", Some(4.0)))
      .toDF("series", "ts_us", "event_id", "value")
    val out = TimeSeries.ohlc(df, Seq("series"), "ts_us", "event_id",
        "value", 10L)
      .select("series", "bucket", "open", "high", "low", "close",
        "n_events", "vsum", "vavg")
      .as[(String, Long, Double, Double, Double, Double, Long, Double,
        Double)].collect().toSet
    assert(out == Set(
      ("s", 0L, 5.0, 9.0, 2.0, 2.0, 3L, 16.0, 5.333333),
      ("s", 10L, 4.0, 4.0, 4.0, 4.0, 1L, 4.0, 4.0)))
  }

  test("ohlc same-timestamp ties resolve by id, immune to lpad truncation") {
    // all three events share ts=0; ids include a 19-digit snowflake and a
    // long-prefix pair that a 12-char lpad would truncate into a tie —
    // the length-prefixed key must order deterministically: shortlex
    // ranks the SHORT id first, then the two 19-char ids lexicographically
    val df = Seq(
      ("s", 0L, "9999999999999999999", 1.0),
      ("s", 0L, "9999999999999999998", 2.0),
      ("s", 0L, "42", 3.0))
      .toDF("series", "ts_us", "event_id", "value")
    val r = TimeSeries.ohlc(df, Seq("series"), "ts_us", "event_id",
        "value", 10L)
      .select("open", "close", "n_events").head()
    assert(r.getDouble(0) == 3.0, "open = id '42' (shortest id)")
    assert(r.getDouble(1) == 1.0, "close = id '…99' (lexic. max of 19-char)")
    assert(r.getLong(2) == 3L)
  }

  test("lttb keeps the spike in interior buckets and the endpoints at " +
    "the edges") {
    // series s, step 10, three buckets:
    //   [0,10): points at ts 1 (v=1.0) and 3 (v=2.0)  → FIRST point (ts 1)
    //   [10,20): ts 11 (v=5.0 flat), ts 14 (v=50.0 SPIKE), ts 17 (v=5.0)
    //            → the spike wins the triangle vs neighbor means
    //   [20,30): ts 21 (v=3.0) and 25 (v=4.0)         → LAST point (ts 25)
    // plus a null-value row (dropped) and a single-bucket series d
    // (keeps its first point)
    val df = Seq(
      ("s", 1L, 10L, Some(1.0)), ("s", 3L, 11L, Some(2.0)),
      ("s", 11L, 12L, Some(5.0)), ("s", 14L, 13L, Some(50.0)),
      ("s", 17L, 14L, Some(5.0)), ("s", 15L, 19L, None),
      ("s", 21L, 15L, Some(3.0)), ("s", 25L, 16L, Some(4.0)),
      ("d", 5L, 17L, Some(9.0)), ("d", 7L, 18L, Some(8.0))
    ).toDF("series", "ts_us", "id", "value")
    val out = TimeSeries.lttb(df, Seq("series"), "ts_us", "id", "value",
        stepMicros = 10L)
      .select("series", "bucket", "ts_us", "id", "value", "n_in_bucket")
      .as[(String, Long, Long, Long, Double, Long)].collect().toSet
    assert(out == Set(
      ("s", 0L, 1L, 10L, 1.0, 2L),   // first bucket → first observation
      ("s", 10L, 14L, 13L, 50.0, 3L), // interior → the spike
      ("s", 20L, 25L, 16L, 4.0, 2L),  // last bucket → last observation
      ("d", 0L, 5L, 17L, 9.0, 2L)))   // single-bucket series → first
  }

  test("tsMicros ns branch FLOORS negative timestamps like epoch_us") {
    // -1500 ns is -2 µs under floor (DuckDB epoch_us) but -1 under
    // `div`'s truncation — the correction term must close that gap;
    // nonnegative values are untouched
    val df = Seq(-1500L, -1000L, -999L, 0L, 999L, 1500L).toDF("ts")
    val out = df.select(graft.core.Tables.tsMicros(df).as("us"))
      .as[Long].collect().toSeq
    assert(out == Seq(-2L, -1L, -1L, 0L, 0L, 1L))
  }

  test("ohlc orders negative (pre-1970) timestamps numerically") {
    // ts −2 must precede ts −1 inside a bucket (a naive zero-pad of the
    // signed decimal string would reverse them). Bucket ids follow the
    // truncate-toward-zero % both engines share: ts in (−10, 10) snaps
    // to bucket 0 (−2 − (−2 % 10) = 0), ts −12 to bucket −10 — pinned
    // here so a floor-mod "fix" can't silently diverge from the oracle
    val df = Seq(
      ("s", -2L, "a", 7.0), ("s", -1L, "b", 8.0), ("s", -12L, "c", 6.0))
      .toDF("series", "ts_us", "event_id", "value")
    val out = TimeSeries.ohlc(df, Seq("series"), "ts_us", "event_id",
        "value", 10L)
      .select("bucket", "open", "close", "n_events")
      .as[(Long, Double, Double, Long)].collect().toSet
    assert(out == Set(
      (0L, 7.0, 8.0, 2L),   // ts −2 then −1: open=7.0, close=8.0
      (-10L, 6.0, 6.0, 1L)))
  }

  test("robust z: lower-median/MAD, outlier flags, MAD=0 nulls out") {
    val df = Seq(
      // series a: sorted [1,2,2,3,100] → med=2 (pos ⌈5/2⌉=3); devs
      // [1,0,0,1,98] → sorted cells [0×2, 1×2, 98] → MAD=1 (pos 3)
      ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
      // series b: half the values identical → MAD=0 → null z, no flag
      ("b", 5.0), ("b", 5.0), ("b", 9.0),
      // series c: even n → LOWER median (pos ⌈2/2⌉=1) = 1
      ("c", 1.0), ("c", 3.0)
    ).toDF("series", "value")
    val out = TimeSeries.robustZscore(df, Seq("series"), "value")
      .select("series", "value", "series_med", "series_mad", "robust_z",
        "is_anomaly").collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5)))).toMap
    assert(out(("a", 100.0)) ==
      ((2.0, 1.0, Some(0.6745 * 98.0), true)))
    assert(out(("a", 1.0)) == ((2.0, 1.0, Some(-0.6745), false)))
    assert(out(("b", 9.0)) == ((5.0, 0.0, None, false)))
    assert(out(("c", 1.0))._1 == 1.0) // lower median, not interpolated 2.0
  }

  test("cusum pinpoints the level shift with exact integer deviations") {
    // [1,1,1,5,5] in centi-units: n=5, S=1300; |n·prefix − k·S| peaks at
    // k=3 (2400) — the LAST point of the old level, the classic CUSUM
    // split; singleton series X is dropped (needs ≥ 2 points)
    val df = Seq(
      ("A", 1L, 10L, 1.0), ("A", 2L, 11L, 1.0), ("A", 3L, 12L, 1.0),
      ("A", 4L, 13L, 5.0), ("A", 5L, 14L, 5.0),
      ("X", 9L, 99L, 7.0)
    ).toDF("series", "ts", "id", "value")
    val out = TimeSeries.cusumChangePoint(df, Seq("series"), "ts", "id",
      "value").collect()
    assert(out.length === 1, "singleton series must drop")
    val r = out.head
    assert(r.getString(0) === "A" && r.getLong(1) === 5L)
    assert(r.getLong(2) === 3L && r.getLong(3) === 12L,
      "change point = argmax |cusum|")
    assert(r.getLong(4) === 2400L && r.getLong(5) === 1300L)
  }

  test("seasonal decompose: linear series has zero detrended mass, " +
    "edges get null trend") {
    // v_t = 10 + t over 49 hourly buckets: the centered 2×24 MA
    // reproduces a linear series exactly, so det_fp = 0, seasonal = 0,
    // remainder = 0 wherever the window is complete (t = 12..36)
    val hr = 3600000000L
    val rows = (0 until 49).map(t => ("A", t * hr, 10.0 + t))
    val out = TimeSeries.seasonalDecompose(
        rows.toDF("series", "ts_us", "value"), Seq("series"), "ts_us",
        "value", periodSteps = 24, stepMicros = hr)
      .collect().map(r => r.getLong(1) / hr ->
        ((Option(r.get(4)), Option(r.get(5)), Option(r.get(6)),
          Option(r.get(7))))).toMap
    for (t <- 12 to 36) {
      val (trend, det, se, rem) = out(t.toLong)
      assert(trend.contains(10.0 + t), s"t=$t trend=$trend")
      assert(det.contains(0L) && se.contains(0L) && rem.contains(0L))
    }
    assert(out(0L)._1.isEmpty && out(48L)._1.isEmpty,
      "incomplete centered window ⇒ null trend")
  }

  test("seasonal decompose: period-2 square wave splits into flat trend " +
    "and ±seasonal, remainder 0") {
    // v alternates 100/110; with periodSteps = 2 the centered MA is the
    // constant 105, det_fp (cents×4 grid) = ∓2000, phase means center
    // to ±2000, remainder 0
    val hr = 3600000000L
    val rows = (0 until 9).map(t =>
      ("A", t * hr, if (t % 2 == 0) 100.0 else 110.0))
    val out = TimeSeries.seasonalDecompose(
        rows.toDF("series", "ts_us", "value"), Seq("series"), "ts_us",
        "value", periodSteps = 2, stepMicros = hr)
      .collect().map(r => r.getLong(1) / hr ->
        ((Option(r.get(4)), Option(r.get(5)), Option(r.get(6)),
          Option(r.get(7))))).toMap
    for (t <- 1 to 7) {
      val (trend, det, se, rem) = out(t.toLong)
      assert(trend.contains(105.0), s"t=$t trend=$trend")
      val sign = if (t % 2 == 0) -2000L else 2000L
      assert(det.contains(sign) && se.contains(sign) && rem.contains(0L),
        s"t=$t det=$det se=$se rem=$rem")
    }
  }

  test("cusum is partition-order invariant; equal-ts rows break on id") {
    val rows = (1 to 60).map(i =>
      ("S", (i / 2).toLong, i.toLong, if (i <= 30) 2.0 else 9.0))
    val a = TimeSeries.cusumChangePoint(rows.toDF("series", "ts", "id", "value"),
      Seq("series"), "ts", "id", "value").collect().head
    val b = TimeSeries.cusumChangePoint(
      rows.reverse.toDF("series", "ts", "id", "value").repartition(7),
      Seq("series"), "ts", "id", "value").collect().head
    assert(a.toSeq === b.toSeq)
  }
}
