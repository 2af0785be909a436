package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Tables.spread

/** Hashed-feature linear text classifier — the fastText-style quality
  * gate (web-corpus pipelines score documents with a linear model over
  * hashed bag-of-words features and keep high scorers; the model-free
  * heuristics in [[TextAnalysis.qualityScore]] are the other half of
  * that gate).
  *
  * This operator is the SPARK PLUMBING of such a gate: hash each token
  * into one of `buckets` feature ids, average the per-bucket weights,
  * squash with a logistic. A trained model plugs in as a plain
  * `Array[Double]` of per-bucket weights; the default derives a
  * deterministic pseudo-weight per bucket (Knuth multiplicative hash of
  * the bucket id), standing in for trained coefficients so the operator
  * is testable and oracle-checkable without a model artifact.
  *
  * Engine portability (default path): bucket = 16-bit md5 prefix mod
  * `buckets` (exact integer arithmetic in any engine); the per-token
  * weight is kept as an INTEGER in [0, 2^20) and summed exactly as a
  * long — order-independent, no float accumulation — then one exact
  * power-of-two scaling and one correctly-rounded division produce the
  * mean. Only the final logistic passes through libm `exp`, rounded to
  * 6 dp. The injected-weights path folds doubles left-to-right in token
  * order (deterministic, but mirror the fold order when comparing
  * engines).
  *
  * Scale shape: map-only single scan — per-token work is a codegen'd
  * HOF chain (`transform` + `aggregate`), no shuffle, no UDF; injected
  * weights ride as a plan-literal array (fine to ~10^5 buckets; beyond
  * that, broadcast a weights table and join on bucket instead).
  */
object QualityModel {

  /** (id, token_count, score_linear, quality_prob) per document.
    * `score_linear` is the mean per-token weight in [−1, 1);
    * `quality_prob` = `sigmoid(4 · score_linear)`, rounded to 6 dp. */
  def score(df: DataFrame, textCol: String, idCol: String,
            buckets: Int = 256,
            weights: Option[Array[Double]] = None): DataFrame = {
    require(buckets >= 1 && buckets <= 65536,
      s"buckets=$buckets not in 1..65536 (bucket is a 16-bit md5 prefix)")
    weights.foreach(ws => require(ws.length == buckets,
      s"weights.length=${ws.length} != buckets=$buckets"))
    val toks = TextAnalysis.tokens(col(textCol))
    val nToks = size(toks)
    def bucket(t: Column): Column =
      conv(substring(md5(t), 1, 4), 16, 10).cast("long") % buckets
    val lin = weights match {
      case Some(ws) =>
        val arr = array(ws.map(lit): _*)
        val s = aggregate(
          transform(toks, t => element_at(arr, (bucket(t) + 1).cast("int"))),
          lit(0.0), (a, x) => a + x)
        s / nToks.cast("double")
      case None =>
        // integer weights summed exactly: w(b) = (b·2654435761) mod 2^20,
        // mean rescaled to [-1, 1) with one division at the end
        val s = aggregate(
          transform(toks, t => (bucket(t) * lit(2654435761L)) % lit(1048576L)),
          lit(0L), (a, x) => a + x)
        s.cast("double") / (nToks.cast("double") * lit(1048576.0)) * 2 - 1
    }
    spread(df).select(col(idCol), nToks.as("token_count"), lin.as("__lin"))
      .select(col(idCol), col("token_count"),
        round(col("__lin"), 6).as("score_linear"),
        round(lit(1.0) / (lit(1.0) + exp(col("__lin") * -4.0)), 6)
          .as("quality_prob"))
  }
}
