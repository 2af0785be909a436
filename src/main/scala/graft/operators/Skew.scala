package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew handling for hot join keys.
  *
  * AQE's skew-join splitting covers reads at runtime; this is the
  * write-side/deterministic form for when a handful of keys dominate
  * (one giant site, one hot device): replicate the small side `salt`
  * ways, spread the big side's rows across salts deterministically, join
  * on (key, salt). Each hot key's rows land in `salt` tasks instead of
  * one.
  */
object Skew {

  /** @param facts  big, possibly-skewed side
    * @param dims   small side (replicated `salt`×)
    * @param key    equi-join column (both sides)
    * @param salt   replication factor (≥1)
    * @param spreadCol fact column whose hash spreads rows across salts —
    *                  pick something high-cardinality (a row id), NOT the
    *                  join key (hashing the hot key would keep it hot)
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 salt: Int, spreadCol: String): DataFrame = {
    require(salt >= 1, s"salt=$salt")
    val saltedFacts = facts.withColumn("__salt",
      pmod(xxhash64(col(spreadCol)), lit(salt.toLong)))
    val saltedDims = dims.withColumn("__salt",
      explode(transform(sequence(lit(0), lit(salt - 1)),
        i => i.cast("long"))))
    saltedFacts.join(saltedDims, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew diagnostic — the generic sizing input behind every salt /
    * cap / broadcast-hot-key decision in this engine (what
    * `dedup_multiplicity` is for content hashes, for ANY key column):
    * per-key counts folded into an order-of-magnitude histogram, one row
    * per decimal-digit bucket (`digits` = number of digits in the key's
    * row count — exact integer string length, no float log to drift
    * across engines). A healthy key is all mass in low buckets; a
    * `digits=8` row IS the 10⁷-duplicate straggler the scaladocs size
    * against.
    *
    * Scale shape: the per-key count is one map-side-combining hash
    * aggregate (a hot key contributes one partial per map task); the
    * histogram is a second aggregate over |keys| rows. Nothing sorts,
    * nothing collects. */
  def keyProfile(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("__cnt"))
      .groupBy(length(col("__cnt").cast("string")).cast("int").as("digits"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("__cnt")).as("n_rows"),
        max(col("__cnt")).as("max_count"))

  /** The `topN` hottest keys by row count (ties → smaller key first) —
    * the companion drill-down to [[keyProfile]]'s histogram; feeds the
    * hot-key allow-lists that broadcast-side caps and salting use.
    * Compiles to TakeOrderedAndProject over the count aggregate:
    * per-partition heaps, an N-row driver merge, no full sort. */
  def hotKeys(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN=$topN")
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("key_count"))
      .orderBy(col("key_count").desc, col(keyCol))
      .limit(topN)
  }
}
