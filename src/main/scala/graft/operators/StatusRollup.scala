package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    */
  def rollup(df: DataFrame, entityCol: String, statusCol: String,
             successValue: String = "SUCCESS"): DataFrame = {
    val counts = df.groupBy(col(entityCol), col(statusCol))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col("cnt").desc, col(statusCol).desc)
    val modes = counts
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(entityCol), col(statusCol).as("mode_status"))
    val flags = df.groupBy(col(entityCol)).agg(
      max(when(col(statusCol) === successValue, 1).otherwise(0)).as("any_success"),
      min(when(col(statusCol) === successValue, 1).otherwise(0)).as("all_success"))
    flags.join(modes, Seq(entityCol))
      .select(col(entityCol),
        when(col("all_success") === 1, lit(successValue))
          .when(col("any_success") === 1, lit("PARTIAL_METRIC_FAILURE"))
          .otherwise(col("mode_status")).as("device_status"))
  }
}
