package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: which training documents share
  * enough word n-grams with an evaluation/benchmark document that the
  * benchmark is compromised? (The standard pre-training hygiene check —
  * see the n-gram overlap decontamination procedure described in the
  * GPT-3 and PaLM papers.)
  *
  * Scale shape (the asymmetry is the whole design): the eval set is tiny
  * and fixed (benchmarks are thousands of docs) while the train corpus is
  * the 100 TB side. Distinct n-grams are produced map-side by the codegen
  * shingle kernel, hashed to 8-byte keys, and the EVAL side is broadcast —
  * the train corpus is scanned once, never shuffled, and only matching
  * (test, train) pairs reach the final aggregation.
  */
object Contamination {

  /** Pairs (test_id, train_id) sharing ≥ `minShared` distinct word
    * n-grams, with `overlap_frac` = shared / |test doc's n-grams|.
    *
    * `xxhash64` on the shingle shrinks the broadcast and the join keys to
    * longs; a hash collision could over-count `shared_ngrams` by one, the
    * standard trade at corpus scale (string keys would be exact but ship
    * n-word strings through every executor).
    */
  def ngramOverlap(train: DataFrame, test: DataFrame,
                   textCol: String, idCol: String,
                   n: Int = 3, minShared: Int = 2): DataFrame = {
    def shingled(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
        explode(graft.functions.Shingles.distinctShingles(
          TextAnalysis.tokens(col(textCol)), n)).as("shingle"))
        .select(col(as), xxhash64(col("shingle")).as("sh"))
    val testSizes = test.select(col(idCol).as("test_id"),
      size(graft.functions.Shingles.distinctShingles(
        TextAnalysis.tokens(col(textCol)), n)).as("n_test_ngrams"))
    shingled(train, "train_id")
      .join(broadcast(shingled(test, "test_id")), Seq("sh"))
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .join(broadcast(testSizes), Seq("test_id"))
      .withColumn("overlap_frac",
        round(col("shared_ngrams").cast("double") / col("n_test_ngrams"), 6))
  }
}
