package graft

import org.apache.spark.sql.functions._
import graft.operators.RateTransform

/** The reference's 8-step golden counter sequence (FIXTURES.md §A3;
  * reference `tests/test_plugin_agent.py:241-323`) — every rate guard:
  * first-sample skip, normal conversion, Δt<0, Δt=0, Δt>3×interval,
  * low confidence, counter reset. */
class RateTransformSpec extends SparkSpec {
  import spark.implicits._

  // (step, series, counter value, ts seconds); interval = 60
  private val steps = Seq(
    (1, "s1", 0.0, 1000.0),     // no previous → no rate
    (2, "s1", 60.0, 1060.0),    // Δt=60 → rate 1
    (3, "s1", 120.0, 1120.0),   // Δt=60 → rate 1
    (4, "s1", 130.0, 1100.0),   // Δt=-20 → skip (state still advances)
    (5, "s1", 140.0, 1100.0),   // Δt=0 → skip
    (6, "s1", 1000.0, 1400.0),  // Δt=300 > 3×60 → skip
    (7, "s1", 1200.0, 1550.0),  // Δt=150 → rate floor(200/150)=1, conf 0.4
    (8, "s1", 100.0, 1660.0)    // reset (100 < 1200) → skip
  ).toDF("step", "series", "value", "ts")

  test("golden 8-step sequence hits every guard") {
    val out = RateTransform.batch(steps, Seq("series"), "value", "ts",
      "step", lit(60))
      .select("step", "rate", "confidence")
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)

    val expect = Seq(
      (1, None, None),            // no previous sample
      (2, Some(1L), Some(1.0)),   // (60-0)/60
      (3, Some(1L), Some(1.0)),
      (4, None, None),            // Δt < 0
      (5, None, None),            // Δt = 0
      (6, None, Some(0.2)),       // Δt > TTL (confidence still computed)
      (7, Some(1L), Some(0.4)),   // converts after state advanced on skips
      (8, None, Some(0.55))       // counter reset (Δt=110)
    )
    assert(out.toSeq == expect)
  }

  test("rate floors toward zero like the reference int()") {
    val df = Seq((1, "s", 0.0, 0.0), (2, "s", 100.0, 60.0))
      .toDF("step", "series", "value", "ts")
    val r = RateTransform.batch(df, Seq("series"), "value", "ts", "step", lit(60))
      .filter(col("step") === 2).select("rate").as[Long].head()
    assert(r == 1L) // 100/60 = 1.67 → 1
  }

  test("series are independent") {
    val df = Seq((1, "a", 0.0, 0.0), (1, "b", 50.0, 0.0),
      (2, "a", 60.0, 60.0), (2, "b", 170.0, 60.0))
      .toDF("step", "series", "value", "ts")
    val r = RateTransform.batch(df, Seq("series"), "value", "ts", "step", lit(60))
      .filter(col("step") === 2)
      .select("series", "rate").as[(String, Long)].collect().toMap
    assert(r == Map("a" -> 1L, "b" -> 2L))
  }
}
