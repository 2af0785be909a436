package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

import graft.core.Schemas
import graft.dsl.MetricsDsl.GroupConfig

/** Metrics-group assembly — the final step of the polling dataflow
  * (`plugin_polling_generic_snmp.py:586-678`): turn an evaluated per-index
  * frame ([[graft.dsl.MetricsDsl.evaluateIndexed]] output) into
  * reference-shaped nested rows ([[Schemas.metricsGroup]]).
  *
  *  - dimension/metric arrays are built in sorted-name order (W2), so
  *    serialization and hashing are shuffle-stable;
  *  - a null target column (failed/skipped at that index) is ABSENT from
  *    its array, exactly like a key missing from `targets_map[index]`;
  *  - the content hash covers resource + metric `name|value|type` strings
  *    + dimension strings — creation timestamps excluded — mirroring the
  *    set-equality basis of `metrics.py:388-398,120-151`, so
  *    `dropDuplicates("content_hash")` IS the reference's set-union dedup
  *    (A7/SO4);
  *  - the clock is an injected column (F14 discipline: wall-clock never
  *    enters hash-verified output).
  *
  * Pure map-side projection: assembly adds no shuffle on top of the DSL
  * evaluation joins.
  */
object GroupAssembly {

  /** Canonical `name|value|type` render of a metric struct
    * (`metrics.py:148-151` `__str__`). */
  def metricsRender(metrics: Column): Column =
    array_join(transform(metrics, m => concat_ws("|",
      m.getField("metric_name"),
      m.getField("metric_value").cast("string"),
      m.getField("metric_type"))), ",")

  /** Canonical `name|value` render of a dimension struct. */
  def dimsRender(dims: Column): Column =
    array_join(transform(dims, d => concat_ws("|",
      d.getField("dimension_name"),
      d.getField("dimension_value"))), ",")

  /** @param indexed  evaluateIndexed output (`index` + one column/target)
    * @param config   the group config that produced it
    * @param resource the resource struct column to embed
    * @param clockTs  injected epoch-seconds clock (rounded to ms, F14/W2)
    */
  def assemble(indexed: DataFrame, config: GroupConfig,
               resource: Column, clockTs: Column): DataFrame = {
    val present = indexed.columns.toSet
    val dimCols = config.dimensions.keys.toSeq.sorted.filter(present)
    val metCols = config.metrics.keys.toSeq.sorted.filter(present)

    val dims =
      if (dimCols.isEmpty) array().cast(ArrayType(Schemas.dimension))
      else filter(array(dimCols.map(n => struct(
        lit(n).as("dimension_name"),
        col(n).cast("string").as("dimension_value"))): _*),
        d => d.getField("dimension_value").isNotNull)
    val mets =
      if (metCols.isEmpty) array().cast(ArrayType(Schemas.metric))
      else filter(array(metCols.map(n => struct(
        lit(n).as("metric_name"),
        col(n).cast("double").as("metric_value"),
        lit(config.metrics(n).metricType).as("metric_type"),
        round(clockTs, 3).as("metric_creation_timestamp"))): _*),
        m => m.getField("metric_value").isNotNull)

    indexed.select(
      col("index"),
      lit(config.groupType).as("metrics_group_type"),
      lit(config.interval).as("metrics_group_interval"),
      round(clockTs, 3).as("metrics_group_creation_timestamp"),
      lit("0.2").as("metrics_group_schema_version"),
      resource.as("resource"),
      dims.as("dimensions"),
      mets.as("metrics"))
      .withColumn("content_hash", sha2(concat_ws("|",
        to_json(col("resource")),
        metricsRender(col("metrics")),
        dimsRender(col("dimensions"))), 256))
  }
}
