package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-reconciliation of entity inventories — reference
  * `resources/manager.py:46-142`.
  *
  * Given the currently-stored set and an incoming set (same plugin/site
  * scope), produce a change feed:
  *  - deletes = stored ∖ incoming (`manager.py:74-94`)
  *  - adds    = incoming ∖ stored (`:96-107`)
  *  - updates = stored ∩ incoming (`:109-135`)
  * where deletes/updates are SKIPPED when the stored row's timestamp is
  * newer than the incoming set's timestamp (conflict resolution: a fresher
  * discovery already wrote it).
  *
  * Scale: both anti-joins and the inner join hash-partition on the identity
  * key; at 100 TB the stored side is a bucketed/partitioned table so the
  * shuffle is one-sided. The output is a MERGE-shaped change feed (apply
  * with Delta `MERGE` or an overwrite-by-partition).
  */
object Reconcile {

  /** @param stored     current inventory
    * @param incoming   newly discovered inventory
    * @param identityCols identity key columns (both sides)
    * @param storedTsCol  timestamp column on `stored`
    * @param incomingSetTs the incoming SET's creation timestamp (epoch s) —
    *                     guards DELETES only (`manager.py:83-87`)
    * @param incomingTsCol per-row timestamp column on `incoming` — guards
    *                     UPDATES: the reference compares the stored row's
    *                     timestamp against the incoming RESOURCE's own
    *                     `resource_creation_timestamp` (`manager.py:121-135`),
    *                     not the set timestamp. None falls back to the set
    *                     timestamp (for incoming feeds without per-row ts).
    * @return stored/incoming columns for the key + an `action` column in
    *         {add, delete, update}
    */
  def changes(
      stored: DataFrame,
      incoming: DataFrame,
      identityCols: Seq[String],
      storedTsCol: String,
      incomingSetTs: Double,
      incomingTsCol: Option[String] = None): DataFrame = {
    val key = identityCols

    // incoming is a SET in the reference (identity-deduped on build) —
    // distinct here so a raw feed with repeated keys emits one add each
    val adds = incoming
      .select(key.map(col): _*).distinct()
      .join(stored.select(key.map(col): _*), key, "left_anti")
      .select(key.map(col) :+ lit("add").as("action"): _*)

    // Delete guard: a stored row newer than the incoming SNAPSHOT wins
    // (`manager.py:83-87`).
    val deletes = stored
      .join(incoming.select(key.map(col): _*), key, "left_anti")
      .filter(col(storedTsCol) <= lit(incomingSetTs))
      .select(key.map(col) :+ lit("delete").as("action"): _*)

    // Update guard: the stored row must not be newer than the incoming
    // ROW's own creation timestamp (`manager.py:121-135`).
    val updates = incomingTsCol match {
      case Some(tsCol) =>
        // one update per stored row even if the raw incoming feed repeats
        // an identity key: the reference builds a key→resource dict, so
        // duplicates collapse before comparison — keep the newest row's
        // timestamp (a MERGE-shaped consumer requires unique source keys)
        val incDeduped = incoming
          .groupBy(key.map(col): _*)
          .agg(max(col(tsCol)).as("__inc_ts"))
        stored
          .join(incDeduped, key, "inner")
          .filter(col(storedTsCol) <= col("__inc_ts"))
          .select(key.map(col) :+ lit("update").as("action"): _*)
      case None =>
        stored
          .join(incoming.select(key.map(col): _*), key, "left_semi")
          .filter(col(storedTsCol) <= lit(incomingSetTs))
          .select(key.map(col) :+ lit("update").as("action"): _*)
    }

    adds.unionByName(deletes).unionByName(updates)
  }

  /** APPLY the change feed: the post-MERGE inventory, as a frame — the
    * reference's store write (`resources/manager.py:136-142`) expressed
    * engine-agnostically. Rows land by [[changes]] semantics:
    *
    *  - `delete` keys drop; guard-skipped deletes keep the stored row;
    *  - `add` and `update` keys take the INCOMING row (duplicate incoming
    *    keys collapse to the newest per `incomingTsCol`, like the
    *    reference's key→resource dict);
    *  - guard-skipped updates keep the stored row.
    *
    * `stored` and `incoming` must share the schema. On a real deployment
    * this frame is the `WHEN MATCHED/NOT MATCHED` source of a Delta/Iceberg
    * MERGE or a dynamic-partition overwrite; producing the full post state
    * keeps the operator testable on plain parquet — write it back with
    * `partitionOverwriteMode=dynamic` and only partitions containing
    * changed keys rewrite.
    *
    * Scale: two key-joins against the change feed, both hash-partitioned
    * on the identity key; the change feed is |changes|-sized, typically ≪
    * |stored|, so broadcast when small.
    */
  def applied(
      stored: DataFrame,
      incoming: DataFrame,
      identityCols: Seq[String],
      storedTsCol: String,
      incomingSetTs: Double,
      incomingTsCol: Option[String] = None): DataFrame = {
    val key = identityCols
    val ch = changes(stored, incoming, identityCols, storedTsCol,
      incomingSetTs, incomingTsCol)
    val replaced = ch.filter(col("action").isin("add", "update"))
      .select(key.map(col): _*)
    val removed = ch.filter(col("action").isin("delete", "update"))
      .select(key.map(col): _*)
    // content-hash tiebreak: duplicate keys tied on the timestamp (or the
    // None branch with no timestamp at all) must still collapse to the
    // SAME row on every run/partitioning — dropDuplicates and an
    // untiebroken row_number are both partition-order-dependent. Identical
    // rows hash identically (either is fine); distinct payloads order by
    // hash, deterministically.
    import org.apache.spark.sql.expressions.Window
    val contentHash = xxhash64(incoming.columns.map(col): _*)
    val incOrder = incomingTsCol match {
      case Some(ts) => Seq(col(ts).desc, contentHash)
      case None     => Seq(contentHash)
    }
    val incUnique = incoming.withColumn("__rn", row_number().over(
      Window.partitionBy(key.map(col): _*).orderBy(incOrder: _*)))
      .filter(col("__rn") === 1).drop("__rn")
    stored.join(removed, key, "left_anti")
      .unionByName(incUnique.join(replaced, key, "left_semi"))
  }
}
