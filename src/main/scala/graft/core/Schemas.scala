package graft.core

import org.apache.spark.sql.types._

/** Core data model of the engine, re-expressing the reference's record
  * kinds (yahoo/panoptes `framework/resources.py:60-312`,
  * `framework/metrics.py:62-451`, `framework/enrichment.py:89-494`) as
  * Spark schemas / case classes.
  *
  * Design notes (SURVEY.md §1):
  *  - metadata / dimensions are `MapType(String, String)` — the reference's
  *    EAV layout (`resources.py:999-1008`) exists only because SQLite lacks
  *    map types; we keep the semantics (per-key predicates), not the layout.
  *  - timestamps are epoch-seconds doubles with ms precision on the wire
  *    (`metrics.py:21,87-88`); `TimestampType` internally where useful.
  */
object Schemas {

  /** Entity row — reference `framework/resources.py:105-118`. */
  val resource: StructType = StructType(Seq(
    StructField("resource_site", StringType, nullable = false),
    StructField("resource_class", StringType, nullable = false),
    StructField("resource_subclass", StringType, nullable = false),
    StructField("resource_type", StringType, nullable = false),
    StructField("resource_id", StringType, nullable = false),
    StructField("resource_endpoint", StringType, nullable = false),
    StructField("resource_plugin", StringType, nullable = true),
    StructField("resource_creation_timestamp", DoubleType, nullable = true),
    StructField("resource_metadata",
      MapType(StringType, StringType), nullable = true)
  ))

  /** Identity of a resource — `resources.py:284-292`. */
  val resourceIdentityCols: Seq[String] = Seq(
    "resource_site", "resource_class", "resource_subclass",
    "resource_type", "resource_id")

  /** Metric struct — `framework/metrics.py:62-159`. */
  val metric: StructType = StructType(Seq(
    StructField("metric_name", StringType, nullable = false),
    StructField("metric_value", DoubleType, nullable = false),
    StructField("metric_type", StringType, nullable = false), // gauge|counter
    StructField("metric_creation_timestamp", DoubleType, nullable = false)
  ))

  /** Dimension struct (wire format) — `framework/metrics.py:162-211`. */
  val dimension: StructType = StructType(Seq(
    StructField("dimension_name", StringType, nullable = false),
    StructField("dimension_value", StringType, nullable = false)
  ))

  /** The core fact record — `framework/metrics.py:228-408`; wire schema
    * `framework/utilities/consumer.py:48-98` (version "0.2"). */
  val metricsGroup: StructType = StructType(Seq(
    StructField("metrics_group_type", StringType, nullable = false),
    StructField("metrics_group_interval", LongType, nullable = false),
    StructField("metrics_group_creation_timestamp", DoubleType, nullable = false),
    StructField("metrics_group_schema_version", StringType, nullable = false),
    StructField("resource", resource, nullable = false),
    StructField("dimensions", ArrayType(dimension), nullable = false),
    StructField("metrics", ArrayType(metric), nullable = false)
  ))

  /** Enrichment side table, flattened — `framework/enrichment.py:89-207`;
    * stored at `<resource_id>:<namespace>` in the reference
    * (`enrichment/enrichment_plugin_agent.py:182`). */
  val enrichment: StructType = StructType(Seq(
    StructField("resource_id", StringType, nullable = false),
    StructField("namespace", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("attributes", MapType(StringType, StringType), nullable = false),
    StructField("enrichment_creation_timestamp", DoubleType, nullable = true),
    StructField("enrichment_ttl", LongType, nullable = true)
  ))

  /** Identifier regex for metric/dimension names —
    * `framework/metrics.py:18` (`^[^\d\W]\w*\Z`). */
  val identifierRegex = "^[^\\d\\W]\\w*$"

  /** Name of the missing-value defaults — reference
    * `plugin_polling_device_interface_metrics.py:28-29`. */
  val MissingString = "<not set>"
  val MissingNumber: Long = -1L

  /** Rate-transform constants — `framework/const.py:107,109`. */
  val KvStoreTtlMultiple = 3
  val ConfidenceThreshold = 0.33
}

/** Typed core records (Dataset[T] surface). */
case class Resource(
    resource_site: String,
    resource_class: String,
    resource_subclass: String,
    resource_type: String,
    resource_id: String,
    resource_endpoint: String,
    resource_plugin: Option[String],
    resource_creation_timestamp: Option[Double],
    resource_metadata: Map[String, String])

case class Metric(
    metric_name: String,
    metric_value: Double,
    metric_type: String,
    metric_creation_timestamp: Double)

case class Dimension(dimension_name: String, dimension_value: String)

case class MetricsGroup(
    metrics_group_type: String,
    metrics_group_interval: Long,
    metrics_group_creation_timestamp: Double,
    metrics_group_schema_version: String,
    resource: Resource,
    dimensions: Seq[Dimension],
    metrics: Seq[Metric])
