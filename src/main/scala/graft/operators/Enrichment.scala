package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Schemas

/** Enrichment side-table operators — reference
  * `framework/enrichment.py:504-668` and the interface enrichment plugin
  * (`plugins/enrichment/interface/plugin_enrichment_interface.py`).
  */
object Enrichment {

  /** J1 — enrichment lookup join: a fact stream looks up
    * `(resource_id, namespace, key)` in the enrichment table and pulls
    * attributes in as dimensions; missing rows get defaults
    * (`plugin_polling_device_interface_metrics.py:28-29,322-328`).
    *
    * Scale: the enrichment table is small relative to the fact stream
    * (per-device interface tables), so we broadcast it — a map-side hash
    * join with zero shuffle of the fact side. If it outgrows the broadcast
    * threshold, drop the hint and let AQE pick; the join key stays the
    * same.
    */
  def lookupJoin(
      facts: DataFrame,
      enrich: DataFrame,
      joinKeys: Seq[String],
      defaults: Map[String, Column]): DataFrame = {
    val joined = facts.join(broadcast(enrich), joinKeys, "left")
    defaults.foldLeft(joined) { case (df, (c, default)) =>
      df.withColumn(c, coalesce(col(c), default))
    }
  }

  /** J2 — parent-interface self-join: each row joined back to the same
    * table via `parent_key → key` to pull the parent's attributes, with
    * `<not set>` / -1 defaults when there is no parent
    * (`plugin_enrichment_interface.py:169-186,44-56`). */
  def parentSelfJoin(
      df: DataFrame,
      keyCol: String,
      parentKeyCol: String,
      pulledCols: Seq[(String, Column)]): DataFrame = {
    val child = df.alias("c")
    val parent = df.alias("p")
    val joined = child.join(parent,
      col(s"c.$parentKeyCol") === col(s"p.$keyCol"), "left")
    val kept = df.columns.map(c => col(s"c.$c"))
    val pulled = pulledCols.map { case (c, default) =>
      coalesce(col(s"p.$c"), default).as(s"parent_$c")
    }
    joined.select(kept ++ pulled: _*)
  }

  /** Attribute-schema validation — the Cerberus analogue
    * (`framework/enrichment.py:41-65`; e.g. the interface schema requires
    * integer speeds, `enrichment/schema/interface.py`). `spec` maps a
    * required attribute key to its type (`"string"` or `"integer"`).
    * Returns (valid, invalid): rows missing a required key or failing the
    * integer check go to the invalid frame — ingest-time enforcement, the
    * scalable form of the reference's per-record validator. */
  def validateAttributes(df: DataFrame, attrsCol: String,
                         spec: Map[String, String]): (DataFrame, DataFrame) = {
    val ok = spec.map { case (k, typ) =>
      val v = col(attrsCol).getItem(k)
      typ match {
        case "integer" => v.isNotNull && v.try_cast("long").isNotNull
        case "string"  => v.isNotNull
        case other => throw new IllegalArgumentException(
          s"unknown attribute type $other for $k")
      }
    }.reduce(_ && _)
    (df.filter(ok), df.filter(!coalesce(ok, lit(false))))
  }

  /** A8 — last-write-wins upsert: within each key keep the newest record
    * (`framework/enrichment.py:277-278,465-479`). `tieBreak` makes the
    * result deterministic when timestamps collide. */
  def lastWriteWins(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieBreak: Seq[String]): DataFrame = {
    val ordering = (col(tsCol).desc +: tieBreak.map(col(_).desc))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
