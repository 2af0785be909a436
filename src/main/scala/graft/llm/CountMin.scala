package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) built and probed as
  * PLAIN DATAFRAMES — the constant-memory frequency summary for streams
  * and corpora too large to hold an exact count table.
  *
  * The sketch IS a (row, bucket, cnt) frame of at most d·w rows: building
  * it is ONE map-side-combined hash aggregate over the token stream
  * (each token contributes to d buckets), so a 100 TB corpus reduces to
  * a fixed d·w-row summary in a single scan — and because counter arrays
  * ADD, the aggregate is commutative/mergeable: shards, days, or
  * micro-batches can each build their own frame and a `union → groupBy →
  * sum` merges them exactly (unlike order-dependent summaries such as
  * Misra–Gries, which this repo deliberately does not use — merge order
  * would leak into results and break the determinism discipline).
  *
  * Probing takes min over the d rows per item; the estimate is a
  * DETERMINISTIC upper bound (est ≥ true always, not just w.h.p.), with
  * overestimate ≤ 2·N/w at probability 1 − (1/2)^d per the standard
  * analysis. Everything is md5-prefix integer arithmetic — exact in any
  * engine, so the DuckDB oracle replays build AND probe bit-for-bit.
  *
  * Next to the built-in sketch surface (`sketch_profile`'s HLL +
  * approx-quantiles), this is the FREQUENCY member of the family — the
  * heavy-hitter screen that answers "is this token/URL/key hot?" without
  * a vocabulary-sized exact table.
  */
object CountMin {

  /** Hash row `i`'s bucket for an item: 32-bit md5 prefix of the
    * row-salted item, mod `w`. Exact integer arithmetic end to end. */
  def bucket(item: Column, i: Int, w: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), item)), 1, 8), 16, 10)
      .cast("long") % w

  /** Build the sketch over an item column (one count per ROW — pre-weight
    * with explode upstream if items repeat within a row): a (row, bucket,
    * cnt) frame, ≤ d·w rows. Cells no item hashed to are absent (= 0). */
  def build(items: DataFrame, itemCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 16, s"d=$d not in 1..16")
    require(w >= 1, s"w=$w must be >= 1")
    val keys = (0 until d).map(i => struct(lit(i).as("row"),
      bucket(col(itemCol), i, w).as("bucket")))
    items.select(explode(array(keys: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for each item in `probes`: est = min over
    * the d rows of that item's bucket counters (absent cell = 0). The
    * sketch frame broadcasts — it is ≤ d·w rows by construction. */
  def probe(probes: DataFrame, itemCol: String, cms: DataFrame,
            d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 16, s"d=$d not in 1..16")
    val keys = (0 until d).map(i => struct(lit(i).as("row"),
      bucket(col(itemCol), i, w).as("bucket")))
    probes.select(col(itemCol), explode(array(keys: _*)).as("rb"))
      .select(col(itemCol), col("rb.row").as("row"),
        col("rb.bucket").as("bucket"))
      .join(broadcast(cms), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
