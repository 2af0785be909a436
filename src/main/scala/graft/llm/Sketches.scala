package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables.spread

/** Deterministic HyperLogLog register algebra over md5 hashes — the
  * constant-memory estimator for cross-source content overlap.
  *
  * [[Corpus.sourceOverlap]] computes EXACT pairwise shared-gram counts
  * with a gram self-join; that is the right tool for mixture labels, but
  * its shuffle carries the full (source, gram) universe. This sketch
  * path reduces each source to 256 integer registers (max leading-zero
  * rank per register, Flajolet et al.'s HLL) and estimates |A|, |B| and
  * |A∪B| from register maxima, giving overlap ≈ |A|+|B|−|A∪B| by
  * inclusion–exclusion — shuffle volume per source is 256 rows
  * REGARDLESS of corpus size, and registers merge by `max`, so partial
  * aggregation does the heavy lifting map-side.
  *
  * == Engine-exact determinism (unusual for a sketch) ==
  * Most sketch implementations are engine-specific; this one is
  * oracle-checkable because every step up to the final division is
  * exact integer arithmetic on the md5 hex string, and the hash →
  * (register, rank) derivation is ONE SQL expression string shared
  * verbatim by the Spark plan (`expr`) and the DuckDB oracle:
  *   - register = value of the first two hex chars (8 bits, m=256);
  *   - rank ρ = leading zero BITS of the remaining 120 bits + 1,
  *     computed from hex-char runs (no integer parsing), capped at 57;
  *   - the raw-estimate denominator Z = Σ 2^−ρ_j is kept as the exact
  *     integer S = Σ 2^(57−ρ_j) (absent registers contribute 2^57),
  *     summed in DECIMAL(38,0);
  *   - estimate = (α·m²·2^57) / S — the numerator is ONE shared double
  *     literal, the division a single correctly-rounded IEEE op.
  * The estimate is raw HLL with an OPTIONAL linear-counting small-range
  * branch (est = m·ln(m/V) when the raw estimate ≤ 2.5m and empty
  * registers remain — Flajolet et al. 2007's correction, itself
  * replayable: ln on identical integer-derived operands), used by the
  * profile queries whose per-source sets run small; no bias table. The
  * operator targets vocabulary-scale sets where raw HLL is in its
  * accurate regime; the ±~6.5% (1.04/√256) error is the documented
  * trade for constant memory.
  */
object Sketches {

  /** Registers m = 2^8; rank cap keeps 2^(57−ρ) in a positive long. */
  val M = 256
  val RankCap = 57
  private val alpha: Double = 0.7213 / (1 + 1.079 / M)

  /** The shared estimate numerator α·m²·2^57 (2^57 is a power of two —
    * exactly representable; `Double.toString` round-trips into the
    * oracle). */
  val EstNumerator: Double = alpha * M * M * math.pow(2.0, RankCap)

  /** SQL: register index 0..255 from the first two hex chars of column
    * `h` (an md5 hex string) — shared verbatim with the oracle. */
  val IdxSql: String =
    "(instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + " +
      "(instr('0123456789abcdef', substr(h, 2, 1)) - 1)"

  /** SQL: HLL rank ρ from the remaining 30 hex chars — leading zero hex
    * chars × 4 + the leading zero bits of the first non-zero hex digit
    * + 1, capped. Shared verbatim with the oracle. */
  val RhoSql: String = {
    val zeros = "length(regexp_extract(substr(h, 3), '^0*', 0))"
    val firstDigit = s"substr(h, 3 + $zeros, 1)"
    val bits = s"(CASE WHEN $firstDigit IN ('4','5','6','7') THEN 1 " +
      s"WHEN $firstDigit IN ('2','3') THEN 2 " +
      s"WHEN $firstDigit = '1' THEN 3 " +
      "ELSE 0 END)"
    s"least($zeros * 4 + $bits + 1, $RankCap)"
  }

  private val twoPowCap = new java.math.BigDecimal(
    java.math.BigInteger.ONE.shiftLeft(RankCap))

  /** Per-key HLL registers from a frame of (keys..., `h` md5-hex) rows:
    * one row per (keys, register) with the max rank `m`. Map-side `max`
    * partials make the shuffle carry ≤ 256 rows per key per task. */
  def registers(hashed: DataFrame, keyCols: Seq[String]): DataFrame =
    hashed
      .withColumn("idx", expr(IdxSql))
      .withColumn("rho", expr(RhoSql))
      .groupBy(keyCols.map(col) :+ col("idx"): _*)
      .agg(max(col("rho")).as("m"))

  /** Exact integer denominator S = Σ 2^(57−m) over all 256 registers
    * (absent registers count 2^57), as DECIMAL(38,0). */
  private def denominator(reg: DataFrame, keyCols: Seq[String]): DataFrame =
    reg.groupBy(keyCols.map(col): _*)
      .agg(sum(expr(
        s"cast(shiftleft(cast(1 as bigint), $RankCap - m) as decimal(38,0))"))
        .as("__sp"), count(lit(1)).as("__nreg"))
      .withColumn("s_int", col("__sp") +
        (lit(M.toLong) - col("__nreg")).cast("decimal(38,0)") *
          lit(twoPowCap))
      .select(keyCols.map(col) :+ col("s_int"): _*)

  private def estimate(sInt: org.apache.spark.sql.Column) =
    round(lit(EstNumerator) / sInt.cast("double"), 3)

  /** Per-key cardinality estimate from a REGISTER frame (keys..., idx,
    * m) — the fold that turns maintained registers into the distinct
    * count, shared by the batch overlap path and the streaming sketch
    * (whose state IS the register frame): S = Σ 2^(57−m) with absent
    * registers at 2^57, estimate = α·m²·2^57 / S, one correctly-rounded
    * division. Output: (keys..., n_reg, est). Registers merge by `max`,
    * so folding a union of per-shard register frames through
    * [[registers]]' aggregate first gives the fleet-wide estimate.
    *
    * `smallRange = true` adds Flajolet et al.'s standard linear-counting
    * branch: when the raw estimate ≤ 2.5·m and empty registers exist,
    * estimate = m·ln(m / V) with V the empty-register count — the fix
    * for raw HLL's multiplicative small-range bias (n ≪ m). Still
    * oracle-exact: V is an exact integer, both `ln` operands are small
    * integers in doubles, so any IEEE engine reproduces the estimate
    * bit-for-bit (the BM25 ln-on-identical-inputs argument). Off by
    * default so existing raw-estimate callers/oracles are untouched. */
  def cardinality(reg: DataFrame, keyCols: Seq[String],
                  smallRange: Boolean = false): DataFrame = {
    val withS = reg.groupBy(keyCols.map(col): _*)
      .agg(sum(expr(
        s"cast(shiftleft(cast(1 as bigint), $RankCap - m) as decimal(38,0))"))
        .as("__sp"), count(lit(1)).as("n_reg"))
      .withColumn("__s_int", col("__sp") +
        (lit(M.toLong) - col("n_reg")).cast("decimal(38,0)") *
          lit(twoPowCap))
    val raw = lit(EstNumerator) / col("__s_int").cast("double")
    val est =
      if (smallRange)
        when(raw <= lit(2.5 * M) && col("n_reg") < lit(M.toLong),
          round(lit(M.toDouble) *
            log(lit(M.toDouble) /
              (lit(M.toLong) - col("n_reg")).cast("double")), 3))
          .otherwise(round(raw, 3))
      else round(raw, 3)
    withS.select(keyCols.map(col) ++
      Seq(col("n_reg"), est.as("est")): _*)
  }

  /** Pairwise source overlap estimates from one pass of HLL registers:
    * (source_a, source_b, est_a, est_b, est_union, overlap_est) for every
    * source pair sharing ≥ 1 register (with 256 registers, any two
    * non-trivial sources). Grams are the same distinct word `n`-shingles
    * as [[Corpus.sourceOverlap]].
    *
    * The pairwise union denominator is derived WITHOUT enumerating
    * register unions per pair: S_union = S_a + S_b − 256·2^57 +
    * Σ_{shared idx} (2^(57−max) − 2^(57−m_a) − 2^(57−m_b) + 2^57), so
    * the only pairwise work is an equi-join of the two register frames
    * on the register index — never a cross join. Estimation error can
    * make `overlap_est` slightly negative for disjoint sources; callers
    * clamp if they need a measure. */
  def hllSourceOverlap(df: DataFrame, textCol: String, sourceCol: String,
                       n: Int = 3): DataFrame = {
    val sg = spread(df).select(col(sourceCol).as("source"),
        explode(graft.functions.Shingles.distinctShingles(
          TextAnalysis.tokens(col(textCol)), n)).as("gram"))
      .select(col("source"), md5(col("gram")).as("h"))
      .distinct()
    // registers are |sources|×256 — checkpoint so the per-source and
    // pairwise branches don't re-scan the corpus
    val reg = registers(sg, Seq("source")).localCheckpoint()
    val perSrc = denominator(reg, Seq("source"))
    val w = (c: String) => expr(
      s"cast(shiftleft(cast(1 as bigint), $RankCap - $c) as decimal(38,0))")
    val shared = reg.toDF("source_a", "idx", "ma")
      .join(reg.toDF("source_b", "idx", "mb"), Seq("idx"))
      .filter(col("source_a") < col("source_b"))
      .withColumn("__adj",
        w("greatest(ma, mb)") - w("ma") - w("mb") + lit(twoPowCap))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("__adj")).as("adj"))
    shared
      .join(broadcast(perSrc.toDF("source_a", "s_a")), Seq("source_a"))
      .join(broadcast(perSrc.toDF("source_b", "s_b")), Seq("source_b"))
      .withColumn("s_union",
        col("s_a") + col("s_b") + col("adj") -
          lit(twoPowCap.multiply(new java.math.BigDecimal(M))))
      .select(col("source_a"), col("source_b"),
        estimate(col("s_a")).as("est_a"),
        estimate(col("s_b")).as("est_b"),
        estimate(col("s_union")).as("est_union"),
        round(estimate(col("s_a")) + estimate(col("s_b")) -
          estimate(col("s_union")), 3).as("overlap_est"))
  }

  /** Mergeable log-bucket QUANTILE sketch — the constant-memory
    * percentile estimator that completes the sketch family (CountMin:
    * frequency, HLL: distinct, this: quantiles). The exact
    * `percentile()` in event_percentiles collects a per-group value
    * multiset — the right tool at oracle SF, unbounded state at 100 TB;
    * the engine-specific `approx_percentile` (t-digest) is bounded but
    * not replayable in another engine. This sketch is BOTH bounded and
    * engine-exact:
    *
    *  - values land on the fixed grid g = floor(v·gridPerUnit);
    *  - g buckets by its TWO LEADING DECIMAL DIGITS — the HDR-histogram
    *    scheme, ≤ 90 buckets per decade, relative bucket width ≤ 10%/
    *    leading-pair (≈ 1% of the value for the pair ≥ 10) — with the
    *    bucket bounds derived by STRING math (leading digits ‖ zero
    *    padding → BIGINT), exact and identical in any engine, no libm
    *    log anywhere;
    *  - per (group, bucket) counts merge by +, so partial aggregation
    *    happens map-side and a shard's sketch unions into the fleet's
    *    by the same aggregate (property-pinned);
    *  - the quantile estimate interpolates linearly inside the selected
    *    bucket: for target mass t = p·n, the first bucket (by lo) with
    *    cumulative ≥ t yields est = (lo + (hi−lo)·(t−cum_before)/cnt) /
    *    gridPerUnit — every operand an exact integer in a double, the
    *    arithmetic single correctly-rounded IEEE ops, so the oracle
    *    reproduces the estimate bit-for-bit (rounded to 6 dp).
    *
    * Scale shape: ONE hash aggregate of the corpus to |groups| × ≤ a few
    * hundred bucket rows (localCheckpointed — its several small
    * consumers must not re-scan the corpus), one tiny cumulative window
    * over those rows, and a |ps|-literal explode. Negative, null and
    * NaN values are EXCLUDED from the estimate (the sketch targets
    * non-negative measures — latencies, sizes, counts; callers needing
    * signed quantiles shift first; NaN fails both the null and the < 0
    * test yet floor-casts to 0, so it must be named explicitly or it
    * would silently land in the lowest bucket) but never silently: they
    * ride the
    * same single pass in a null sentinel bucket, every output row
    * carries the group's `n_dropped` exclusion count, and a group whose
    * rows are ALL excluded still emits its (group, p) rows with n = 0
    * and a null est. Estimate error is bounded by the selected bucket's
    * width — ≤ ~1% relative once g ≥ 100, absolute 1/gridPerUnit below
    * that.
    *
    * Value-magnitude bound: the grid index floor(v·gridPerUnit) must fit
    * a BIGINT, so v < 2⁶³/gridPerUnit (~9.2·10¹⁵ at the default grid).
    * Beyond it the cast fails the job under ANSI mode (loud, not a
    * wrong quantile); rescale gridPerUnit for astronomical measures.
    *
    * Output: one row per (group, p): (keyCols…, p, n, est, n_dropped).
    * p = 0 maps to the lowest bucket's lower bound, p = 1 to the
    * highest bucket's upper bound. */
  def histQuantiles(df: DataFrame, keyCols: Seq[String], valueCol: String,
                    ps: Seq[Double],
                    gridPerUnit: Long = 1000L): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"ps=$ps must be within [0,1]")
    require(gridPerUnit >= 1, s"gridPerUnit=$gridPerUnit must be >= 1")
    val ks = keyCols.map(col)
    val excluded = col(valueCol).isNull || col(valueCol) < 0 ||
      isnan(col(valueCol).cast("double"))
    val (lo, hi) = bucketBounds(col(valueCol), gridPerUnit)
    // ONE corpus aggregate serves both the sketch and the "no silent
    // caps" signal: excluded rows land in a null SENTINEL bucket, so the
    // exclusion counts ride the same map-side-combined pass instead of a
    // second scan; the split below is over the tiny bucket frame
    val all = df
      .select(ks :+ when(!excluded, lo).as("__lo")
        :+ when(!excluded, hi).as("__hi"): _*)
      .groupBy(ks :+ col("__lo") :+ col("__hi"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint()
    val dropped = all.filter(col("__lo").isNull)
      .select(ks :+ col("__cnt").as("n_dropped"): _*)
    val buckets = all.filter(col("__lo").isNotNull)
    val found = quantilesOfBuckets(buckets, keyCols, ps, gridPerUnit)
    // groups whose rows were ALL excluded still report: their (group, p)
    // rows carry n = 0 and a null est next to the exclusion count
    val allDropped = dropped
      .join(buckets.select(ks: _*).distinct(), keyCols, "left_anti")
      .select(ks ++ Seq(explode(array(ps.map(lit): _*)).as("p"),
        lit(0L).as("n"), lit(null).cast("double").as("est"),
        col("n_dropped")): _*)
    found.join(dropped, keyCols, "left")
      .withColumn("n_dropped", coalesce(col("n_dropped"), lit(0L)))
      .unionByName(allDropped)
  }

  /** The HDR bucket bounds (lo, hi) of a value on the `gridPerUnit`
    * grid — string math on the two leading decimal digits, shared by
    * [[histQuantiles]] and the streaming sketch's at-ingest aggregate. */
  def bucketBounds(value: org.apache.spark.sql.Column,
                   gridPerUnit: Long): (org.apache.spark.sql.Column,
                                        org.apache.spark.sql.Column) = {
    val gs = floor(value * lit(gridPerUnit.toDouble))
      .cast("long").cast("string")
    val digits = length(gs)
    val pad = repeat(lit("0"), greatest(digits - 2, lit(0)))
    val lead = substring(gs, 1, 2) // ≤ 2 chars when digits == 1
    (concat(lead, pad).cast("long"),
      concat((lead.cast("long") + 1).cast("string"), pad).cast("long"))
  }

  /** Bucket frame → quantile estimates: the READ-SIDE fold shared by
    * [[histQuantiles]] and the streaming sketch (whose maintained state
    * IS the (keys…, __lo, __hi, __cnt) bucket frame — counts merge
    * by +, so per-shard/per-window sketches union through one aggregate
    * first). One tiny cumulative window over |groups| × ≤ hundreds of
    * bucket rows, a |ps| explode, linear in-bucket interpolation —
    * every operand an exact integer in a double. Output: (keys…, p, n,
    * est). */
  def quantilesOfBuckets(buckets: DataFrame, keyCols: Seq[String],
                         ps: Seq[Double], gridPerUnit: Long): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"ps=$ps must be within [0,1]")
    val ks = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(ks: _*).orderBy(col("__lo"))
    val cum = buckets
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", sum(col("__cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(ks: _*)))
    val withP = cum.select(ks ++ Seq(col("__lo"), col("__hi"),
      col("__cnt"), col("__cum"), col("__n"),
      explode(array(ps.map(lit): _*)).as("p")): _*)
      .withColumn("__t", col("p") * col("__n").cast("double"))
    // first bucket (by lo) whose cumulative mass reaches the target
    val pick = withP
      .filter(col("__cum").cast("double") >= col("__t"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(ks :+ col("p"): _*).orderBy(col("__lo"))))
      .filter(col("__rn") === 1)
    pick.select(ks ++ Seq(col("p"), col("__n").as("n"),
      round((col("__lo").cast("double") +
        (col("__hi") - col("__lo")).cast("double") *
          (col("__t") - (col("__cum") - col("__cnt")).cast("double")) /
          col("__cnt").cast("double")) /
        lit(gridPerUnit.toDouble), 6).as("est")): _*)
  }
}
