package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk profiling for release/training-set curation:
  * k-anonymity over quasi-identifier columns — the complement of
  * [[Pii]]'s direct-identifier scrubbing (removing emails does not help
  * if (lang, source, length-bucket) already singles a document out).
  * Standard pre-release audit for datasets derived from user content.
  *
  * == Scale shape ==
  * Equivalence classes are ONE hash aggregate over the quasi-identifier
  * tuple (map-side partial counts — the same shape as any groupBy), and
  * the corpus-level risk summary folds the class frame (|classes| rows,
  * not |rows|) a second time. Nothing shuffles the raw corpus twice and
  * nothing is collected. Risk fractions are exact integer ppm
  * (`x * 1000000 div n`), keeping the engine/oracle comparison float-free.
  */
object Privacy {

  private def classes(df: DataFrame, quasi: Seq[Column]): DataFrame =
    df.groupBy(quasi: _*).agg(count(lit(1)).as("class_size"))

  /** Per-equivalence-class view: the quasi-identifier tuple, its class
    * size, and whether it violates `k`-anonymity (fewer than `k` rows
    * share the tuple ⇒ each is re-identifiable to within class_size
    * candidates). */
  def kAnonymityClasses(df: DataFrame, quasi: Seq[Column],
                        k: Long): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    classes(df, quasi)
      .withColumn("at_risk", col("class_size") < k)
  }

  /** Per-equivalence-class l-diversity view (Machanavajjhala et al.
    * 2007): a class can be k-anonymous yet leak the SENSITIVE attribute
    * outright if every row in it shares one value — distinct
    * l-diversity requires ≥ `l` distinct sensitive values per class.
    * Output: the quasi-identifier tuple, class size, the distinct
    * sensitive count, and the violation flag. Exact integers (a hash
    * aggregate with an exact distinct — one extra shuffle keyed by
    * (class, sensitive) before the class rollup; at 100 TB that is two
    * map-side-combining aggregates, no collection anywhere). */
  def lDiversityClasses(df: DataFrame, quasi: Seq[Column],
                        sensitive: Column, l: Long): DataFrame = {
    require(l >= 2, s"l=$l must be >= 2")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_div"))
      .withColumn("at_risk", col("l_div") < l)
  }

  /** One-row corpus summary: row/class counts, the achieved k-anonymity
    * (min class size — "every row hides among at least k_anon others"),
    * and how many rows sit in sub-`k` classes, as count + exact ppm. */
  def kAnonymityRisk(df: DataFrame, quasi: Seq[Column],
                     k: Long): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    classes(df, quasi).agg(
      sum(col("class_size")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("class_size")).as("k_anon"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
        .as("risky_rows"))
      .withColumn("risky_ppm",
        expr("risky_rows * 1000000 div n_rows"))
  }
}
