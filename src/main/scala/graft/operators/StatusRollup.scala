package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Device-status rollup — reference
  * `plugins/polling/utilities/polling_status.py:191-208`:
  * fold per-check statuses into one device status:
  *  - all SUCCESS → SUCCESS
  *  - any SUCCESS → PARTIAL_METRIC_FAILURE
  *  - else        → mode (most common status), ties broken deterministically
  *    (Counter.most_common is insertion-ordered in the reference; we break
  *    ties by status string descending so results are shuffle-stable).
  */
object StatusRollup {

  /** @param df        one row per (entity, check) outcome
    * @param entityCol grouping key
    * @param statusCol status string; `successValue` marks success
    *
    * Plan shape: two cascaded hash aggregations — (entity, status) counts
    * with map-side partial agg, then per-entity `max_by` over
    * (cnt, status) which IS the mode with the desc-status tie-break (the
    * max pair has the highest count, and among equal counts the largest
    * status string). No join, no window sort, no second scan of the input:
    * at 100 TB this is one shuffle of the distinct (entity, status) pairs
    * and one of the entities.
    */
  def rollup(df: DataFrame, entityCol: String, statusCol: String,
             successValue: String = "SUCCESS"): DataFrame = {
    val isSuccess = when(col(statusCol) === successValue, 1).otherwise(0)
    val counts = df.groupBy(col(entityCol), col(statusCol))
      .agg(count(lit(1)).as("cnt"), max(isSuccess).as("is_success"))
    counts.groupBy(col(entityCol))
      .agg(
        max_by(col(statusCol), struct(col("cnt"), col(statusCol)))
          .as("mode_status"),
        max(col("is_success")).as("any_success"),
        min(col("is_success")).as("all_success"))
      .select(col(entityCol),
        when(col("all_success") === 1, lit(successValue))
          .when(col("any_success") === 1, lit("PARTIAL_METRIC_FAILURE"))
          .otherwise(col("mode_status")).as("device_status"))
  }
}
