package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-predecessor) join: for each left row, attach the latest
  * right row of the same key whose timestamp is <= the left timestamp —
  * the time-series point-in-time lookup (price as of trade time, config as
  * of event time). Spark has no native ASOF JOIN; the naive encodings are a
  * range join (O(left × right) candidate explosion) or a per-key collect.
  *
  * This implementation is union + ordered window: tag each side, union on a
  * common schema, sort per key by (ts, side) with right rows first at equal
  * ts (inclusive <=), and carry the last-seen right payload forward with
  * `last(..., ignoreNulls = true)`. One hash shuffle on the key, one
  * per-partition sort, zero row blowup — the plan a 100 TB run needs
  * (both sides can be arbitrarily large; neither is broadcast).
  *
  * 100 TB posture: cost is a single shuffle of left+right on the key and a
  * spillable sort — same shape as a sort-merge join, minus the range
  * explosion. A hot key serializes within its partition; pre-bucket by a
  * coarse time range and stitch boundaries if a single key exceeds a
  * partition (same remedy as [[Sessionize]]).
  *
  * Right rows must be unique per (key, ts) — the match at a duplicated
  * timestamp would be sort-order-dependent; dedupe upstream (e.g.
  * `groupBy(key, ts).agg(max(payload))`).
  */
object AsofJoin {

  /** Forward (nearest-successor) as-of join: for each left row, the
    * EARLIEST right row of the same key at or after the left timestamp —
    * the labeling lookup ("next purchase after this view", "next failure
    * after this deploy"). `tolerance` bounds right.ts − left.ts.
    *
    * Implemented by running [[leftAsof]] on negated timestamps (ts must
    * be an integer epoch column, the library convention): negation maps
    * nearest-successor onto nearest-predecessor exactly, including the
    * inclusive-equality and tolerance semantics, so both directions share
    * one verified kernel and one plan shape. */
  def leftAsofForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      asofTsName: String = "asof_ts",
                      tolerance: Option[Long] = None): DataFrame =
    leftAsof(
      left.withColumn(leftTs, -col(leftTs)),
      right.withColumn(rightTs, -col(rightTs)),
      key, leftTs, rightTs, asofTsName, tolerance)
      .withColumn(leftTs, -col(leftTs))
      .withColumn(asofTsName, -col(asofTsName))

  /** Left as-of join. Output = every `left` row + `right`'s payload columns
    * (right minus `key` minus `rightTs`) + `asofTsName` (the matched right
    * timestamp), all null when no right row is at or before the left row.
    * `tolerance`: max allowed left.ts − right.ts (same integer unit as the
    * ts columns); matches older than that are nulled out.
    * Right rows with a null key or null ts never match (SQL join semantics).
    */
  def leftAsof(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               asofTsName: String = "asof_ts",
               tolerance: Option[Long] = None): DataFrame = {
    val (carried, leftCarry, payload) =
      unionFrame(left, right, key, leftTs, rightTs, asofTsName)
        match { case (u, lc, p) =>
          (u.withColumn("__m",
            last(col("__r"), ignoreNulls = true).over(
              orderedWindow(key).rowsBetween(
                Window.unboundedPreceding, Window.currentRow))), lc, p)
        }
    val mTs = col("__m").getField("__rts")
    val inTol = tolerance match {
      case Some(t) => col("__m").isNotNull && col("__ts") - mTs <= t
      case None    => col("__m").isNotNull
    }
    carried.filter(col("__side") === 1)
      .withColumn("__hit", inTol)
      .select(
        (col(key) +: col("__ts").as(leftTs) +: leftCarry.map(col)) ++
          (when(col("__hit"), mTs).as(asofTsName) +:
            payload.map(c =>
              when(col("__hit"), col("__m").getField(c)).as(c))): _*)
  }

  /** Nearest as-of join: for each left row, the right row of the same key
    * MINIMIZING |right.ts − left.ts|, ties broken toward the EARLIER
    * right row (the backward match — matching DuckDB's
    * `ORDER BY distance, ts LIMIT 1` convention, so the oracle is a
    * genuinely different algorithm). The sensor-fusion lookup: align
    * each reading with the closest reading of another stream, whichever
    * side of it. `tolerance` bounds |Δ| symmetrically.
    *
    * Same single-shuffle union+window kernel as [[leftAsof]], with BOTH
    * directions computed in one pass: the predecessor via
    * `last(_, ignoreNulls)` over (−∞, current] and the successor via
    * `first(_, ignoreNulls)` over (current, +∞) — the two frames share
    * one partitioning and one sort, so EnsureRequirements plans ONE
    * exchange. An equal-ts right row sorts before the left row, so it
    * lands in the predecessor frame with Δ = 0, which always wins the
    * comparison — the successor frame legitimately never needs it. */
  def leftAsofNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      asofTsName: String = "asof_ts",
                      tolerance: Option[Long] = None): DataFrame = {
    val (u, leftCarry, payload) =
      unionFrame(left, right, key, leftTs, rightTs, asofTsName)
    val w = orderedWindow(key)
    val carried = u
      .withColumn("__p", last(col("__r"), ignoreNulls = true).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", first(col("__r"), ignoreNulls = true).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    val dP = col("__ts") - col("__p").getField("__rts")
    val dN = col("__n").getField("__rts") - col("__ts")
    def ok(m: Column, d: Column): Column = tolerance match {
      case Some(t) => m.isNotNull && d <= t
      case None    => m.isNotNull
    }
    val pOk = ok(col("__p"), dP)
    val nOk = ok(col("__n"), dN)
    val m = when(pOk && (!nOk || dP <= dN), col("__p"))
      .otherwise(when(nOk, col("__n")))
    carried.filter(col("__side") === 1)
      .withColumn("__m", m)
      .select(
        (col(key) +: col("__ts").as(leftTs) +: leftCarry.map(col)) ++
          (col("__m").getField("__rts").as(asofTsName) +:
            payload.map(c => col("__m").getField(c).as(c))): _*)
  }

  private def orderedWindow(key: String) =
    Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))

  /** The shared union construction: both sides tagged onto one schema —
    * key, __ts, __side, left carry cols, and the right row packed into
    * ONE struct (`__r`) — non-null iff the row came from the right side,
    * so an ignoreNulls window carry moves the whole matched row and a
    * legitimately-null payload FIELD inside it is preserved (per-column
    * carry would back-fill it from an older right row). Right rows sort
    * before left rows at equal ts → `<=` is inclusive.
    * Returns (union, left carry columns, right payload columns). */
  private def unionFrame(left: DataFrame, right: DataFrame, key: String,
                         leftTs: String, rightTs: String,
                         asofTsName: String)
      : (DataFrame, Seq[String], Seq[String]) = {
    val payload = right.columns.filter(c => c != key && c != rightTs).toSeq
    val leftCarry = left.columns.filter(c => c != key && c != leftTs).toSeq
    require(!payload.contains(asofTsName) && !leftCarry.contains(asofTsName),
      s"output column '$asofTsName' collides with an input column")
    require(leftCarry.intersect(payload).isEmpty,
      s"left/right column collision: ${leftCarry.intersect(payload).mkString(",")}")
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val rStruct = struct(col(rightTs).as("__rts") +: payload.map(col): _*)
    val ru = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
        (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
          leftCarry.map(c => lit(null).cast(lTypes(c)).as(c))) :+
          rStruct.as("__r"): _*)
    val nullStruct = lit(null).cast(ru.schema("__r").dataType)
    val lu = left.select(
      (col(key) +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        leftCarry.map(col)) :+ nullStruct.as("__r"): _*)
    (lu.unionByName(ru), leftCarry, payload)
  }
}
