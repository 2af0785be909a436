package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** [[score]] with the weights as a TABLE instead of a plan literal —
    * the trained-model path for large weight sets. A plan-literal
    * `Array[Double]` bloats the serialized plan (shipped per task,
    * re-parsed per query) long before the feature space maxes out, so
    * trained weights ride as data: broadcast-join each token's bucket
    * against a `(bucket, weight)` frame and re-aggregate per document.
    * Both paths share the 16-bit md5-prefix bucket function, so 65536
    * buckets is the ceiling HERE TOO — a full fastText-default space
    * (2²¹ buckets) additionally needs the one-line wider-prefix swap
    * (`substring(md5, 1, 8)` and the matching oracle change) on BOTH
    * paths; the join shape below is already the right one at that size
    * (a 2²¹-row double table broadcasts at ~32 MB).
    *
    * Plan shape: explode(tokens) is map-side; the weights join is a
    * BROADCAST hash join (a 2²¹-row double table is ~32 MB — well inside
    * broadcast range; buckets absent from the table weigh 0.0, so sparse
    * models ship only their support); the only shuffle is the final
    * per-document aggregate, map-side-combined on the doc id. At 100 TB
    * the shuffle carries one partial row per (doc, map task) — the same
    * cost class as `text_stats`, not a pairwise stage.
    *
    * Determinism: per-token weights are summed as DECIMAL(38,18) — exact
    * and order-free, unlike a double fold — then converted to double
    * once for the mean. For weights exactly representable in ≤18
    * decimal places (any quantized model; the spec uses dyadic weights)
    * the sum equals [[score]]'s left-fold bit-for-bit, so the two paths
    * produce identical output on every document with ≥1 token.
    * Zero-token documents are DROPPED (nothing to explode — and a
    * re-attach join would scan the source a second time for rows whose
    * score is vacuous; the literal path scores them NaN from 0/0 —
    * either way, filter `token_count > 0` before gating).
    *
    * @param weightsDf (bucket: integral, weight: double) — one row per
    *                  bucket with nonzero weight; duplicate buckets are
    *                  a caller error (the join would multiply tokens). */
  def scoreTable(df: DataFrame, textCol: String, idCol: String,
                 buckets: Int, weightsDf: DataFrame): DataFrame = {
    require(buckets >= 1 && buckets <= 65536,
      s"buckets=$buckets not in 1..65536 (bucket is a 16-bit md5 prefix)")
    val toks = TextAnalysis.tokens(col(textCol))
    val w = broadcast(weightsDf.select(
      col(weightsDf.columns(0)).cast("long").as("__bucket"),
      col(weightsDf.columns(1)).cast("decimal(38,18)").as("__w")))
    spread(df)
      .select(col(idCol), size(toks).as("token_count"),
        explode(toks).as("__tok"))
      .withColumn("__bucket",
        conv(substring(md5(col("__tok")), 1, 4), 16, 10).cast("long")
          % buckets)
      .join(w, Seq("__bucket"), "left")
      .groupBy(col(idCol), col("token_count"))
      .agg(sum(coalesce(col("__w"),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)")))
        .as("__wsum"))
      .withColumn("__lin",
        col("__wsum").cast("double") / col("token_count").cast("double"))
      .select(col(idCol), col("token_count"),
        round(col("__lin"), 6).as("score_linear"),
        round(lit(1.0) / (lit(1.0) + exp(col("__lin") * -4.0)), 6)
          .as("quality_prob"))
  }

  /** Percentile calibration of a raw quality score within each group
    * (per-source, per-language): raw classifier/heuristic scores are not
    * comparable across sources — a 0.6 on arXiv and a 0.6 on raw crawl
    * mean different things — so threshold-based filtering uses the score's
    * percentile WITHIN its source instead ("keep every source's top 80%").
    * Emits `pct` = SQL `percent_rank() OVER (PARTITION BY group ORDER BY
    * score)`: ties share a value, `(rank-1)/(n-1)`, 0 for a single-row
    * group.
    *
    * Scale shape: a naive per-row window would sort each group in one
    * task — a straggler when one source is most of the corpus. Instead the
    * row grain collapses FIRST to distinct (group, score) cells with
    * counts (a map-side-combining aggregate; a 6-dp score in [0,1] has
    * ≤ 10⁶ cells per group regardless of corpus size), percent ranks are
    * computed on the collapsed frame via a cumulative-count window (tiny:
    * cells, not rows), and the cell table broadcasts back onto the rows —
    * the corpus itself is scanned, aggregated, and map-side joined, never
    * sorted.
    *
    * The input is materialized once (`localCheckpoint`): the cell
    * aggregate and the row-side probe are separate subplans, and without
    * the checkpoint Catalyst re-runs the upstream scoring scan for each
    * (the sf1 rehearsal measured the un-checkpointed plan at ~2× — the
    * mm_neardup/memoized-dedup precedent). Pass a PROJECTED frame (id,
    * group, score), not one still carrying document text: what you pass
    * is what gets materialized. */
  def calibrate(df: DataFrame, scoreCol: String, groupCol: String)
      : DataFrame = {
    val base = df.localCheckpoint()
    val cells = base.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__cnt"))
    val byScore = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pctTable = cells
      .withColumn("__below", coalesce(sum(col("__cnt")).over(byScore),
        lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(whole))
      .withColumn("pct", when(col("__n") > 1L,
        round(col("__below").cast("double") / (col("__n") - 1L), 6))
        .otherwise(lit(0.0)))
      .select(col(groupCol), col(scoreCol), col("pct"))
    base.join(broadcast(pctTable), Seq(groupCol, scoreCol))
  }
}
