package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity matching — the record-linkage shape (block, then
  * string-distance confirm) that catalog/metadata curation runs before
  * joining dirty entity tables: product names, author strings, venue
  * names. The same structure appears in training-data work when document
  * METADATA (titles, site names) must be reconciled across crawls whose
  * text content already dedups elsewhere.
  *
  * Design for 100 TB:
  *  - Never all-pairs. The row grain collapses FIRST to distinct names
  *    with support counts (one map-side-combining aggregate — the name
  *    universe is Heaps-law small next to the record count, the same
  *    argument as the BPE vocabulary), and ALL pairing happens at the
  *    name grain. A million records of "old bolt" cost one row in the
  *    pair join, not 10¹² pairs — the cosineNearDupPairs canonicalize
  *    trick applied to strings.
  *  - Block before distance. Candidate pairs share a caller-chosen block
  *    key (default: the name's last token — the head noun for
  *    adjective–noun product names); within a block a LENGTH-BAND gate
  *    (|len_a − len_b| ≤ maxDist, a lower bound on edit distance) kills
  *    most candidates before the O(L²) Levenshtein DP runs. Both are
  *    standard ER blocking (Fellegi–Sunter style pipelines).
  *  - Levenshtein is Spark's built-in (codegen'd, unit edit costs) —
  *    identical semantics to DuckDB's `levenshtein`, so the oracle
  *    compares exactly.
  *
  * Skew posture: a hot block (one noun dominating the catalog) squares
  * at the NAME grain, not the record grain — to tighten further, pass a
  * composite `blockKey` (e.g. noun + first char, or noun + length band);
  * the [[graft.operators.Skew]] diagnostics size that decision.
  */
object EntityMatch {

  /** Default block key: the last whitespace-separated token. */
  def lastToken(name: Column): Column =
    element_at(split(name, " "), -1)

  /** Distinct-name match pairs within blocks: (name_a, name_b, dist,
    * n_a, n_b) with name_a < name_b, dist = Levenshtein ≤ `maxDist`,
    * n_* = record support of each name. Identical names never pair with
    * themselves (they are one grain row); a downstream id-level expand is
    * a broadcast join of this (small) match dictionary back onto the
    * records. */
  def blockedNameMatches(df: DataFrame, nameCol: String, maxDist: Int,
                         blockKey: Column => Column = lastToken)
      : DataFrame = {
    require(maxDist >= 0, s"maxDist=$maxDist must be >= 0")
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .select(col("name"), col("n"), blockKey(col("name")).as("block"),
        length(col("name")).as("len"))
    val a = names.select(col("block"), col("name").as("name_a"),
      col("n").as("n_a"), col("len").as("len_a"))
    val b = names.select(col("block"), col("name").as("name_b"),
      col("n").as("n_b"), col("len").as("len_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      // length difference lower-bounds edit distance: a free kill of
      // most in-block candidates before the quadratic DP
      .filter(abs(col("len_a") - col("len_b")) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"),
        col("dist").cast("long").as("dist"), col("n_a"), col("n_b"))
  }
}
