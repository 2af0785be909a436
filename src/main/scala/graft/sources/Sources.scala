package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schemas

/** Batch sources/sinks for the inventory and enrichment stores.
  *
  * Reference mapping (SURVEY.md §2.1):
  *  - S3 JSON discovery source: `plugins/discovery/plugin_discovery_from_json_file.py`
  *  - S2 serialization codec: `framework/resources.py:558-611` (regexes `:450-454`)
  *  - S7 enrichment KV upsert: `enrichment/enrichment_plugin_agent.py:180-188`,
  *    read-back `framework/enrichment.py:622-658`
  */
object Sources {

  /** S3 — read a JSON array (or JSON-lines) of resource records with the
    * fixed resource schema; malformed rows are dropped, mirroring discovery
    * validation. `multiLine=true` handles the reference's array-of-dicts
    * example file format. */
  def readResourcesJson(spark: SparkSession, path: String,
                        multiLine: Boolean = true): DataFrame =
    spark.read
      .schema(Schemas.resource)
      .option("multiLine", multiLine)
      .option("mode", "PERMISSIVE")
      .json(path)
      .filter(col("resource_id").isNotNull)

  /** S2 (encode) — the pipe-delimited serialization key
    * (`resources.py:234-246`). Null fields coalesce to "" so the key
    * always carries all 7 slots (concat_ws would silently DROP a null
    * and shift every later field). */
  def serializationKey(): org.apache.spark.sql.Column = {
    def f(n: String) = coalesce(col(n), lit(""))
    concat_ws("|",
      lit("plugin"), f("resource_plugin"),
      lit("site"), f("resource_site"),
      lit("class"), f("resource_class"),
      lit("subclass"), f("resource_subclass"),
      lit("type"), f("resource_type"),
      lit("id"), f("resource_id"),
      lit("endpoint"), f("resource_endpoint"))
  }

  /** The reference's single anchored sequential pattern
    * (`resources.py:450-454`) — one regex, 7 groups. Independent
    * unanchored per-field extracts would mis-split values that themselves
    * end in a label word (plugin "discovery_site" would satisfy a naive
    * `site\|` search). */
  private val keyPattern =
    "^plugin\\|(.*?)\\|site\\|(.*?)\\|class\\|(.*?)\\|subclass\\|(.*?)" +
      "\\|type\\|(.*?)\\|id\\|(.*?)\\|endpoint\\|(.*)$"

  /** S2 (decode) — parse a serialization key back into its fields
    * (the regex parse of `resources.py:582-606`). */
  def parseSerializationKey(df: DataFrame, keyCol: String): DataFrame = {
    val k = col(keyCol)
    df
      .withColumn("resource_plugin", regexp_extract(k, keyPattern, 1))
      .withColumn("resource_site", regexp_extract(k, keyPattern, 2))
      .withColumn("resource_class", regexp_extract(k, keyPattern, 3))
      .withColumn("resource_subclass", regexp_extract(k, keyPattern, 4))
      .withColumn("resource_type", regexp_extract(k, keyPattern, 5))
      .withColumn("resource_id", regexp_extract(k, keyPattern, 6))
      .withColumn("resource_endpoint", regexp_extract(k, keyPattern, 7))
  }

  /** S7 — enrichment upsert: merge `incoming` into `stored` keyed by
    * (resource_id, namespace, key), last-write-wins on the creation
    * timestamp, and expire rows whose TTL has lapsed relative to `nowTs`.
    * This is the batch (parquet/Delta-MERGE-shaped) form of the Redis
    * `set(key, value, ttl)` store. */
  def enrichmentUpsert(stored: DataFrame, incoming: DataFrame,
                       nowTs: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = stored.unionByName(incoming)
    val w = Window
      .partitionBy(col("resource_id"), col("namespace"), col("key"))
      .orderBy(col("enrichment_creation_timestamp").desc)
    all
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .filter( // TTL expiry — Redis would have evicted these
        col("enrichment_creation_timestamp") + col("enrichment_ttl") >= nowTs)
  }

  /** S7 wildcard read — `namespace='*'` scans all namespaces of a
    * resource (`enrichment.py:627-637`). */
  def readEnrichment(store: DataFrame, resourceId: String,
                     namespace: String): DataFrame = {
    val base = store.filter(col("resource_id") === resourceId)
    if (namespace == "*") base
    else base.filter(col("namespace") === namespace)
  }
}
