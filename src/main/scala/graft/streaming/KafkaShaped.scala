package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka-boundary transforms, expressed as plain DataFrame ops so they work
  * identically on batch frames and streams (and are testable without a
  * broker; with the kafka connector on the classpath the same frames go
  * straight to `writeStream.format("kafka")` — the dynamic `topic` column
  * is native there).
  *
  * Reference: consumer `framework/utilities/consumer.py:187-447`
  * (key filter `:383-389`, JSON decode `:391-398`, schema validation
  * `:136-184,400-405`); producer fan-out
  * `polling/polling_plugin_agent.py:307-364`,
  * `discovery/discovery_plugin_agent.py:142-168`.
  */
object KafkaShaped {

  /** S6 — fan-out encode: one record per (site topic [+ global topic]),
    * message key = the series key (preserves per-series ordering, ST2),
    * value = canonical JSON of the payload struct.
    *
    * Scale: pure map-side projection; the explode doubles rows only when a
    * global topic is configured — no shuffle introduced before the sink.
    */
  def encodeFanout(
      df: DataFrame,
      siteCol: Column,
      topicSuffix: String,
      keyCol: Column,
      payload: Column,
      globalTopic: Option[String] = None): DataFrame = {
    val siteTopic = concat(siteCol, lit("-"), lit(topicSuffix))
    val topics = globalTopic match {
      case Some(g) => array(siteTopic, lit(g))
      case None    => array(siteTopic)
    }
    df.select(
      explode(topics).as("topic"),
      keyCol.cast("string").as("key"),
      to_json(payload).as("value"))
  }

  /** S5/P7/P8 — decode + validate: parse the JSON `value` against `schema`
    * (PERMISSIVE → corrupt rows become null structs), drop invalid records,
    * optionally drop records whose key is not in `allowedKeys`.
    *
    * Invalid-record counts surface via `df.observe` upstream if needed —
    * the filter itself stays codegen-friendly.
    */
  def decodeAndValidate(
      df: DataFrame,
      schema: StructType,
      allowedKeys: Seq[String] = Nil): DataFrame = {
    val keyFiltered =
      if (allowedKeys.isEmpty) df
      else df.filter(
        coalesce(col("key").cast("string").isin(allowedKeys: _*), lit(false)))
    // PERMISSIVE from_json yields an all-null struct for malformed input
    // (not a null struct) — treat both as invalid.
    val anyFieldSet = schema.fields
      .map(f => col(s"parsed.${f.name}").isNotNull)
      .reduce(_ || _)
    keyFiltered
      .withColumn("parsed", from_json(col("value").cast("string"), schema))
      .filter(col("parsed").isNotNull && anyFieldSet)
      .select(col("key").cast("string").as("key"), col("parsed.*"))
  }

  /** The records [[decodeAndValidate]] would DROP — a dead-letter frame.
    * The reference counts skipped records
    * (`consumer.py:136-184,400-405`); at scale a dead-letter sink is the
    * auditable form of that counter (and `count()` on this frame IS the
    * counter). Same predicate, negated, so the two frames partition the
    * input exactly. */
  def invalidRecords(
      df: DataFrame,
      schema: StructType,
      allowedKeys: Seq[String] = Nil): DataFrame = {
    val anyFieldSet = schema.fields
      .map(f => col(s"parsed.${f.name}").isNotNull)
      .reduce(_ || _)
    // null keys: `None not in keys` is True in the reference, i.e. a null
    // key IS dropped by the filter — coalesce keeps three-valued logic
    // from losing such records from BOTH frames
    val keyOk =
      if (allowedKeys.isEmpty) lit(true)
      else coalesce(col("key").cast("string").isin(allowedKeys: _*), lit(false))
    df.withColumn("parsed", from_json(col("value").cast("string"), schema))
      .filter(!keyOk || col("parsed").isNull || !anyFieldSet)
      .select(col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        (!keyOk).as("dropped_by_key_filter"))
  }

  /** Required-field schema enforcement on top of [[decodeAndValidate]]:
    * rows missing any of `requiredFields` (null after parse) are dropped,
    * mirroring the reference's JSON-Schema `required` lists
    * (`consumer.py:48-134`). */
  def enforceRequired(df: DataFrame, requiredFields: Seq[String]): DataFrame =
    requiredFields.foldLeft(df)((d, f) => d.filter(col(f).isNotNull))
}
