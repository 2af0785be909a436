package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** InfluxDB line-protocol rendering as pure column expressions — reference
  * `consumers/influxdb/consumer.py:50-394`. Everything here stays inside
  * whole-stage codegen (no UDFs), so the renderer is a map-only stage that
  * scales linearly with input.
  */
object Influx {

  /** Escape tag keys/values and field keys: `,`, `=`, and whitespace get a
    * backslash (`consumer.py:146-158`). */
  def escapeTag(c: Column): Column =
    regexp_replace(c, "([,=\\s])", "\\\\$1")

  /** Measurement sanitizer: any run of non-alphanumerics → `_`
    * (`consumer.py:84-87`). */
  def sanitizeMeasurement(c: Column): Column =
    regexp_replace(c, "[^0-9a-zA-Z_]+", "_")

  /** Render sorted `key=value` pairs from a map column, comma-separated —
    * tags are emitted in sorted key order, and the reference escapes ONLY
    * the tag VALUE, never the key (`consumer.py:123-126`), so a key
    * containing `,`/`=`/whitespace renders unescaped here too
    * (byte-for-byte parity; keys are code-authored identifiers in
    * practice). */
  def sortedTags(m: Column): Column =
    array_join(
      transform(
        array_sort(map_entries(m)),
        e => concat(e.getField("key"), lit("="),
          escapeTag(e.getField("value")))),
      ",")

  /** Guard for the [[sortedTags]] parity decision: the reference escapes
    * only tag VALUES, so a tag KEY containing `,`/`=`/whitespace would
    * emit corrupt line protocol on BOTH engines. Keys are code-authored
    * identifiers in practice — this check makes that assumption loud at
    * the sink boundary instead of corrupting the wire. Returns the map
    * unchanged when every key is safe; raises otherwise. */
  def assertSafeTagKeys(m: Column): Column = {
    val anyBad = exists(map_keys(m), k => k.rlike("[,=\\s]"))
    when(assert_true(!anyBad,
      concat(lit("influx tag key contains ',', '=', or whitespace: "),
        to_json(map_keys(m)))).isNull, m)
  }

  /** One line: `measurement,tags fields timestamp`
    * (`consumer.py:160-169`); timestamp is integer seconds (`:90-100`). */
  def line(measurement: Column, tags: Column, fields: Column,
           tsSeconds: Column): Column =
    concat_ws(" ",
      concat(sanitizeMeasurement(measurement), lit(","), sortedTags(tags)),
      fields,
      tsSeconds.cast("long").cast("string"))
}
