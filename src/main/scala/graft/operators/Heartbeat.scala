package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The heartbeat polling plugin as a frame transform — reference
  * `plugins/polling/heartbeat/plugin_polling_heartbeat.py:18-47`.
  *
  * Per device, one `heartbeat` metrics group with two gauges:
  *  - `status` = 1 (the plugin ran against the device);
  *  - `heartbeat_enrichment_timestamp` = `int(ts)` of the device's own
  *    (`'self'`) enrichment under namespace `heartbeat_ns` key `heartbeat`,
  *    or -1 when the lookup fails (`:38-47`) — the downstream alert compares
  *    this gauge to the group creation timestamp to detect a stalled
  *    enrichment pipeline.
  *
  * Scale: the enrichment side is one row per enrolled device — orders of
  * magnitude under the broadcast threshold even at millions of devices
  * (a long + short strings per row), so the lookup is a broadcast hash
  * join against the (arbitrarily large) inventory; no shuffle of the
  * resources side. The clock is INJECTED (`clockTs`), never wall-clock, so
  * results replay deterministically.
  */
object Heartbeat {

  /** Enrichment namespace/key the plugin reads (`:40`). */
  val Namespace = "heartbeat_ns"
  val Key = "heartbeat"

  /** @param resources the device inventory (needs `resource_id`)
    * @param enrichment KV rows (`resource_id`, `namespace`, `key`,
    *   `timestamp` double seconds); only `Namespace`/`Key` rows are read
    * @param clockTs injected clock for `metrics_group_creation_timestamp`
    */
  def metrics(resources: DataFrame, enrichment: DataFrame,
              clockTs: Column): DataFrame = {
    // the reference's KV lookup returns ONE value per device — collapse
    // duplicate enrichment rows (e.g. re-enrollment without cleanup) to
    // the freshest, or the join would double-emit heartbeat metrics
    val hb = enrichment
      .filter(col("namespace") === Namespace && col("key") === Key)
      .groupBy(col("resource_id"))
      .agg(max(col("timestamp")).as("__hb_ts"))
    resources.select(col("resource_id"))
      .join(broadcast(hb), Seq("resource_id"), "left")
      .select(
        col("resource_id"),
        lit("heartbeat").as("metrics_group_type"),
        lit(1L).as("status"),
        // int(timestamp): truncate toward zero; -1 when missing (:45-47)
        coalesce(col("__hb_ts").cast("long"), lit(-1L))
          .as("heartbeat_enrichment_timestamp"),
        clockTs.as("metrics_group_creation_timestamp"))
  }
}
