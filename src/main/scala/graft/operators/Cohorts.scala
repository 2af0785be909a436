package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort/retention analytics over an event stream. */
object Cohorts {

  /** Classic retention matrix: every user is assigned to the cohort of
    * their first active period (period = `stepMicros` grid bucket of the
    * event timestamp), and each (cohort, period_offset) cell counts the
    * users active `offset` periods after their cohort period.
    *
    * Plan shape: activity collapses map-side+shuffle to DISTINCT
    * (user, period) — the widest frame in the job is one row per user per
    * active period, never raw events. The first-period aggregate and the
    * activity×first join both hash on the user key, and the final cell
    * count needs no countDistinct (its input is already distinct per
    * user) — a plain count with map-side partials. All-integer math; no
    * float anywhere. */
  def retention(df: DataFrame, userCol: String, tsMicrosCol: String,
                stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"stepMicros=$stepMicros must be positive")
    val ts = col(tsMicrosCol)
    val act = df.select(col(userCol).as("__user"),
        (ts - (ts % lit(stepMicros))).cast("long").as("period"))
      .distinct()
    val first = act.groupBy(col("__user"))
      .agg(min(col("period")).as("cohort"))
    act.join(first, Seq("__user"))
      .groupBy(col("cohort"),
        ((col("period") - col("cohort")) / lit(stepMicros)).cast("long")
          .as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
