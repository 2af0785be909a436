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
}
