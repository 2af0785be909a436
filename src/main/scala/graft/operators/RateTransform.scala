package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Schemas

/** Counter→gauge rate conversion — the reference's only stateful transform
  * (`polling/polling_plugin_agent.py:178-242`).
  *
  * Per series×metric, against the immediately-previous sample:
  *  - no previous sample        → no rate (`:200-202`)
  *  - Δt < 0                    → skip (`:209-212`)
  *  - Δt = 0                    → skip (`:213-215`)
  *  - Δt > 3×interval (TTL)     → skip (`:216-219`, const.py:109)
  *  - v < v_prev (counter reset)→ skip (`:229-240`)
  *  - else rate = int((v − v_prev) / Δt), emitted as a gauge alongside the
  *    counter; confidence = round(interval/Δt, 2), warn-only (`:221-224`).
  *
  * The previous sample is ALWAYS the last-arrived one — the reference's
  * `getset` stores the new value even when conversion is skipped — so the
  * batch form is exactly `lag(1)` over arrival order.
  *
  * Scale: one shuffle on the series key (hash partition), then a sorted
  * window per partition — the same layout a 1000-executor job needs. No
  * driver-side state; skew on hot series is bounded by series cardinality,
  * and AQE skew handling applies to the exchange.
  */
object RateTransform {

  /** Batch form. Adds `rate` (LongType, null when any guard skips),
    * `confidence`, and `dt` columns.
    *
    * @param seriesCols series identity (resource_id, group_type, dims…) +
    *                   metric name — the state key of the reference
    * @param valueCol   counter value (numeric)
    * @param tsCol      sample timestamp, epoch seconds (numeric)
    * @param orderCol   arrival order within the series (the reference
    *                   processes in arrival order, not timestamp order)
    * @param intervalCol polling interval in seconds
    */
  def batch(
      df: DataFrame,
      seriesCols: Seq[String],
      valueCol: String,
      tsCol: String,
      orderCol: String,
      intervalCol: Column): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(col(orderCol))
    val prevV = lag(col(valueCol), 1).over(w)
    val prevT = lag(col(tsCol), 1).over(w)
    val dt = col(tsCol).cast("double") - prevT.cast("double")
    val ttl = intervalCol * lit(Schemas.KvStoreTtlMultiple)
    val ok = prevV.isNotNull && dt > 0 && dt <= ttl &&
      (col(valueCol) >= prevV)
    df
      .withColumn("dt", dt)
      .withColumn("rate",
        when(ok, floor((col(valueCol) - prevV) / dt).cast("long")))
      .withColumn("confidence",
        when(prevV.isNotNull && dt > 0, round(intervalCol / dt, 2)))
  }
}
