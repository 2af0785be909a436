package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / shard-packing for training-data
  * pipelines.
  *
  * Everything here is a pure function of the row's ID (via md5), never of
  * partitioning, row order, or RNG state — so samples are REPRODUCIBLE
  * across runs, engines, and cluster sizes, and a re-run after adding data
  * keeps every previously-selected row in the same split/shard-stream
  * (the property training pipelines actually need; `df.sample()` gives
  * none of it). All operators are map-side or single-window — no joins,
  * no driver state.
  */
object Sampling {

  /** The first two md5 hex chars of the id: 256 stable pseudo-random
    * buckets as a sortable hex string. Salt distinguishes independent
    * samples over the same ids. */
  def hashKey(id: Column, salt: String = ""): Column =
    md5(concat(lit(salt), id.cast("string")))

  /** Deterministic train/validation split: `trainPct` of rows (in 1/256
    * granularity) land in `train`, the rest in `val`, decided only by
    * md5(id). */
  def split(df: DataFrame, idCol: String, trainPct: Double,
            salt: String = ""): DataFrame = {
    require(trainPct > 0 && trainPct < 1, s"trainPct=$trainPct not in (0,1)")
    val threshold = f"${math.floor(trainPct * 256).toInt}%02x"
    df.withColumn("split",
      when(substring(hashKey(col(idCol), salt), 1, 2) < lit(threshold),
        lit("train")).otherwise(lit("val")))
  }

  /** Stratified deterministic sample: the `perStratum` rows of each
    * stratum that sort FIRST by (md5(id), id) — a stable pseudo-random
    * choice per stratum (domain/language balancing caps). One shuffle on
    * the stratum key. */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
                 perStratum: Int, salt: String = ""): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Mixture-weighted downsampling: each source keeps its target fraction
    * of rows (1/256 granularity), decided only by md5(id) — the standard
    * way to hit a corpus mixture (e.g. 10% of crawl, all of books) while
    * keeping the sample reproducible and add-stable per source. Sources
    * not in `rates` keep `default`. Map-side only. */
  def mixture(df: DataFrame, idCol: String, sourceCol: String,
              rates: Seq[(String, Double)], default: Double = 1.0,
              salt: String = ""): DataFrame = {
    def keepFor(rate: Double): Column =
      if (rate >= 1.0) lit(true)
      else if (rate <= 0.0) lit(false)
      else substring(hashKey(col(idCol), salt), 1, 2) <
        lit(f"${math.floor(rate * 256).toInt}%02x")
    val cond = rates.foldRight(keepFor(default)) { case ((src, r), acc) =>
      when(col(sourceCol) === src, keepFor(r)).otherwise(acc)
    }
    df.filter(cond)
  }

  /** Temperature-scaled source rebalancing — the multilingual-LM mixing
    * rule (XLM-R / mT5: sample source s with mass ∝ n_s^(1/T), T > 1
    * flattens the head so low-resource sources aren't drowned out).
    * Derives per-source keep rates from the corpus' own counts such that
    * the EXPECTED kept size is ≈ `frac`·N with source mass rebalanced,
    * then gates each row on the 52-bit md5 uniform ([[weighted]]'s
    * construction — NOT [[mixture]]'s 1/256 hex prefix: these rates are
    * data-derived and can be arbitrarily small, and a 1/256 grid would
    * annihilate any source whose rate lands under 0.004 instead of
    * sampling it thinly). Reproducible and add-stable like every
    * sampler here.
    *
    * Engine-exact rate derivation: weights are `floor(n^(1/T)·10^6)`
    * longs — for the default T=2 the root is IEEE sqrt (correctly
    * rounded, bit-identical in any engine); other T go through libm
    * `pow`, whose last-ulp behavior is platform-typed (same caveat the
    * scaladoc on [[weighted]] explains for Efraimidis–Spirakis). Weight
    * and doc totals are exact long sums; the rate is one
    * correctly-rounded double division, rounded to 6dp before the gate
    * and clamped to ≥ 10⁻⁶ — a source's true rate is always positive
    * (it has rows, so its weight is ≥ 1), and without the clamp a
    * source whose derived rate rounds below 5·10⁻⁷ would be annihilated
    * by the rounding grid — the very failure mode that rules out
    * [[mixture]]'s 1/256 grid here, just finer.
    *
    * Rows with a NULL source sample at the NULL group's own derived
    * rate (the groupBy forms a NULL group; the gate join is null-safe),
    * the same way any other source does.
    *
    * Scale shape: one tiny per-source aggregate (|sources| rows, global
    * window over that aggregate only), broadcast back onto the corpus —
    * the gate itself is map-side; the corpus never shuffles. */
  def temperature(df: DataFrame, idCol: String, sourceCol: String,
                  temp: Double = 2.0, frac: Double = 1.0,
                  salt: String = ""): DataFrame = {
    require(temp > 0, s"temp=$temp must be positive")
    require(frac > 0 && frac <= 1, s"frac=$frac not in (0,1]")
    val alpha = 1.0 / temp
    val root =
      if (alpha == 0.5) sqrt(col("__n").cast("double"))
      else pow(col("__n").cast("double"), lit(alpha))
    val all = Window.partitionBy(lit(1))
    val rates = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(root * lit(1000000.0)).cast("long"))
      .withColumn("__tot", sum(col("__w")).over(all))
      .withColumn("__budget",
        floor(lit(frac) * sum(col("__n")).over(all).cast("double"))
          .cast("double"))
      .withColumn("__rate", greatest(round(least(lit(1.0),
        (col("__budget") * col("__w").cast("double")) /
          (col("__tot").cast("double") * col("__n").cast("double"))), 6),
        lit(0.000001)))
      .select(col(sourceCol).as("__src"), col("__rate"))
    val u52 = conv(substring(hashKey(col(idCol), salt), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0)
    // null-safe: a NULL source matches its own NULL rate group instead
    // of silently dropping out of an equi-join
    df.join(broadcast(rates), col(sourceCol) <=> col("__src"))
      .filter(col("__rate") >= 1.0 || u52 < col("__rate"))
      .drop("__rate", "__src")
  }

  /** Deterministic weighted sample of `k` rows without replacement —
    * sequential Poisson sampling (Ohlsson 1998, the estimator behind
    * πps surveys): each row draws priority `u / w` where `u` is a 52-bit
    * uniform from md5(salt ∥ id) and `w` its weight; the `k` smallest
    * priorities win. Inclusion probability is approximately proportional
    * to weight — the quality-weighted corpus subsampling shape ("sample
    * 1M docs, prefer high-quality ones").
    *
    * Why `u/w` and not the exact Efraimidis–Spirakis key `u^(1/w)`:
    * E-S needs pow/ln, whose last-ulp behavior is libm-specific — two
    * engines could rank near-tied rows differently. `u/w` is one exact
    * power-of-two scaling plus one correctly-rounded IEEE division, so
    * the ranking (and therefore the SAMPLE) is bit-reproducible in any
    * IEEE-754 engine. Same add-stability as the other samplers: a new
    * row displaces at most one previously-selected row.
    *
    * Rows whose weight is NULL or <= 0 are dropped before sampling —
    * they have no meaningful inclusion probability (see inline comment).
    *
    * Global top-k compiles to TakeOrderedAndProject: per-partition
    * partial top-k, then a k-row merge — no full sort, no full shuffle,
    * driver holds k rows. */
  def weighted(df: DataFrame, idCol: String, weightCol: String, k: Int,
               salt: String = ""): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    // rows with weight <= 0 or NULL are excluded up front: a negative or
    // zero weight would yield a negative/infinite priority (ranking
    // FIRST, inverting the sample), and a NULL weight a NULL priority
    // whose sort position differs between engines (Spark NULLS FIRST vs
    // DuckDB NULLS LAST) — neither has a meaningful inclusion probability.
    // NaN must be excluded explicitly: NaN > 0 is TRUE in Spark's
    // ordering, and a NaN weight would yield a NaN priority.
    val w = col(weightCol).cast("double")
    val positive = df.filter(w > 0 && !isnan(w))
    val u52 = conv(substring(hashKey(col(idCol), salt), 1, 13), 16, 10)
      .cast("long").cast("double")
    // /2^52 is exact (power-of-two scaling); the /w division is the one
    // correctly-rounded step — mirror this exact expression in oracles
    val pri = (u52 / lit(4503599627370496.0)) /
      col(weightCol).cast("double")
    positive.withColumn("priority", pri)
      .orderBy(col("priority"), col(idCol))
      .limit(k)
      .withColumn("priority", round(col("priority"), 12))
  }

  /** Per-GROUP weighted sample: [[weighted]]'s sequential-Poisson
    * priorities ranked within each group — "k documents per domain,
    * preferring high-quality ones", the stratified version of the
    * quality-weighted subsample (a global top-k over-serves whichever
    * domain happens to hold the best scores; per-domain caps are how
    * real mixtures are built). Same bit-reproducible `u / w` priority,
    * same add-stability (a new row displaces at most one row of its own
    * group), same NULL/<=0/NaN weight exclusion.
    *
    * One shuffle on the group key; WindowGroupLimit keeps each
    * partition's local top-k per group before the exchange, so the
    * window never sees more than k × groups × partitions rows — the
    * [[stratified]] plan shape with a weighted order. */
  def weightedPerGroup(df: DataFrame, groupCol: String, idCol: String,
                       weightCol: String, k: Int,
                       salt: String = ""): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val w = col(weightCol).cast("double")
    val positive = df.filter(w > 0 && !isnan(w))
    val u52 = conv(substring(hashKey(col(idCol), salt), 1, 13), 16, 10)
      .cast("long").cast("double")
    val pri = (u52 / lit(4503599627370496.0)) /
      col(weightCol).cast("double")
    val win = Window.partitionBy(col(groupCol))
      .orderBy(pri, col(idCol))
    positive.withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .withColumn("priority", round(pri, 12))
  }

  /** Pack documents into token-budget shards per stratum: rows are laid
    * out in the stable (md5(id), id) order, and a document starts a new
    * shard when the RUNNING token count before it crosses a `budget`
    * multiple. Deterministic alternative to greedy bin-packing — shard
    * boundaries never depend on execution order, and each stratum's
    * packing is an independent window (one shuffle on the stratum key).
    * Overweight single documents still get a shard (shard_id advances past
    * them). */
  def packShards(df: DataFrame, strataCol: String, idCol: String,
                 tokensCol: String, budget: Long,
                 salt: String = ""): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    val before = coalesce(
      sum(col(tokensCol)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    // shard_offset = the document's start position in its shard's token
    // space (running count modulo the budget grid) — what a data loader
    // needs to seek a document inside a packed shard without re-counting
    df.withColumn("shard_id", floor(before / lit(budget)).cast("long"))
      .withColumn("shard_offset",
        (before - col("shard_id") * lit(budget)).cast("long"))
  }

  /** Curriculum buckets: split each group into `buckets` difficulty tiers
    * by descending score (ntile — bucket 1 = hardest/highest-score tier,
    * ties broken by id so the cut is deterministic). The curriculum-
    * learning shape: schedule training from easy buckets to hard ones, or
    * mix buckets at fixed rates per epoch.
    *
    * Bucketing is PER GROUP (e.g. per source/domain) rather than global:
    * a global ntile needs a total order — one partition sorting the whole
    * corpus — while the per-group window shuffles once on the group key
    * and scales with the largest group. For a global curriculum at 100 TB
    * compute approximate score quantiles first and assign buckets with a
    * map-side range lookup. */
  def curriculum(df: DataFrame, groupCol: String, scoreCol: String,
                 idCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("curriculum_bucket", ntile(buckets).over(w))
  }

  /** GLOBAL curriculum buckets — the scale path [[curriculum]]'s scaladoc
    * promises: compute the (buckets−1) score quantile thresholds once
    * (one tiny aggregate), broadcast them, and assign buckets with a
    * map-side range lookup. No total sort, no single-partition window —
    * the only non-map work is the threshold aggregate itself. Bucket 1 =
    * highest-score tier, matching [[curriculum]].
    *
    * Uses exact `percentile` here (oracle-comparable); at 100 TB swap in
    * `approx_percentile` — same output columns, bounded memory, and the
    * assignment stage is unchanged. */
  def curriculumGlobal(df: DataFrame, scoreCol: String,
                       buckets: Int): DataFrame = {
    require(buckets > 1, s"buckets=$buckets must be > 1")
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    // typed API — no SQL-string splice, so score columns needing quoting
    // (dots, spaces) work, and the percentage list is a plain literal
    val th = df.agg(
      percentile(col(scoreCol), typedlit(qs)).as("__th"))
    df.crossJoin(broadcast(th))
      .withColumn("curriculum_bucket",
        (lit(buckets) -
          size(filter(col("__th"), t => col(scoreCol) > t))).cast("int"))
      .drop("__th")
  }

  /** Best-of-corpus curation: the top `k` rows per group by descending
    * score (ties → smallest id). The "keep the k highest-quality documents
    * per domain" selection — one shuffle on the group key; with a
    * rank-pushdown-friendly plan the per-partition sort stops early. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Nucleus ("top-p") curation by TOKEN BUDGET: per group, walk rows in
    * descending score order and keep documents while the tokens
    * accumulated BEFORE each one stay under fraction `pNum/pDen` of the
    * group's total — "keep the best half of every domain, measured in
    * tokens, not documents" (doc-count selections like [[topKPerGroup]]
    * over-serve domains with short documents; training budgets are token
    * budgets). The first document of a group always keeps (its
    * cum-before is 0), so an overweight head document cannot empty its
    * group.
    *
    * The fraction rides as a RATIONAL (`pNum/pDen`), so the gate is
    * `cum_before · pDen < total · pNum` — exact integer arithmetic, no
    * float threshold to drift at group boundaries. The products are
    * compared as DECIMAL(38,0): a petascale group total (~10¹³ tokens)
    * times a fine-grained denominator (ppm) overflows a long, and ANSI
    * mode turns that overflow into a query-killing exception rather
    * than a wrong answer — decimal keeps the gate exact at any real
    * scale (DuckDB's HUGEINT window sums match).
    *
    * One shuffle on the group key: the running-sum window and the
    * group-total window share the exchange (same partitioning), ties
    * break on the id, and each group's walk is an independent window —
    * scales with the largest group like [[packShards]]. */
  def topPByBudget(df: DataFrame, groupCol: String, scoreCol: String,
                   idCol: String, tokensCol: String,
                   pNum: Long, pDen: Long): DataFrame = {
    require(pDen > 0 && pNum >= 0 && pNum <= pDen,
      s"p=$pNum/$pDen must be a fraction in [0, 1]")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val before = coalesce(
      sum(col(tokensCol)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val total = sum(col(tokensCol)).over(Window.partitionBy(col(groupCol)))
    df.withColumn("cum_before", before.cast("long"))
      .withColumn("group_total", total.cast("long"))
      .withColumn("kept",
        col("cum_before").cast("decimal(38,0)") * lit(pDen) <
          col("group_total").cast("decimal(38,0)") * lit(pNum))
  }

  /** Materialize a packed corpus as loader-ready shard files — the last
    * mile after [[packShards]] computed (shard_id, shard_offset): one
    * directory per shard (`shard_id=N/`), rows inside each file in
    * shard_offset order, so a data loader seeks by the offsets
    * [[packShards]] emitted. `sortWithinPartitions` after the shard
    * repartition gives the in-file order WITHOUT a global sort — each
    * shard sorts independently inside its write task, and
    * `maxRecordsPerFile` bounds file sizes without another shuffle.
    * One exchange total (the shard hash repartition); at 100 TB shard
    * count scales with corpus/budget, so tasks stay uniform by
    * construction (shards are token-budget-balanced). */
  def writeShards(df: DataFrame, shardCol: String, offsetCol: String,
                  outDir: String, maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(offsetCol))
      .write
      .partitionBy(shardCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(outDir)

  /** Deterministic mixture interleave: a global training-order key that
    * serves each source at its mixture rate ("3 code docs per 7 web docs",
    * smoothly interleaved) without any driver-side scheduling. Every doc
    * gets `sched_key = rank_in_source × (L / weight_source)` — the
    * classic weighted-fair-queueing virtual finish time, with rank the
    * doc's 1-based position in its source's stable md5 order and L the
    * LCM of all weights so the key stays EXACT long arithmetic (no float
    * thresholds; ANSI overflow would need rank·L > 2^63 — petascale rank
    * with pathological weights — and fails loudly, not wrongly). Sorting
    * by (sched_key, source, id) yields the interleaved order; writers
    * range-partition on the key (the distributed sort Spark already
    * does for `orderBy`) rather than collecting it.
    *
    * Sources absent from `weights` get `defaultWeight`; a zero/negative
    * weight is rejected (a source you want OUT of the mix is a filter,
    * not a zero rate). One shuffle on the source key for the rank
    * window; a skewed source is one window partition — same posture as
    * [[packShards]], and the window carries only (id, source), never
    * text. */
  def mixtureSchedule(df: DataFrame, idCol: String, sourceCol: String,
                      weights: Seq[(String, Long)], defaultWeight: Long = 1L,
                      salt: String = ""): DataFrame = {
    require(defaultWeight > 0, s"defaultWeight=$defaultWeight must be > 0")
    weights.foreach { case (s, w) =>
      require(w > 0, s"weight $w for source '$s' must be > 0") }
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate sources in $weights")
    val lcm = (defaultWeight +: weights.map(_._2))
      .reduce((a, b) => a / BigInt(a).gcd(BigInt(b)).toLong * b)
    val stride = weights.foldRight(lit(lcm / defaultWeight)) {
      case ((src, w), acc) =>
        when(col(sourceCol) === src, lit(lcm / w)).otherwise(acc)
    }
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(hashKey(col(idCol), salt), col(idCol))
    df.withColumn("sched_key", row_number().over(w).cast("long") * stride)
  }

  // ------------------------------------------------------- split hygiene

  /** Exact train→val leakage audit: validation-split rows whose NORMALIZED
    * content hash also occurs in the training split. A held-out set that
    * shares verbatim documents with the training set silently inflates
    * eval numbers — the standard hygiene check run right after
    * [[split]] and before any loss/benchmark is trusted. Normalization
    * (NFC + lowercase + whitespace collapse, same canon as
    * `dedup_exact_norm`) catches the trivially-reformatted copies an
    * exact byte hash would miss.
    *
    * Emits one AUDIT row per validation document: (id, content_hash,
    * n_train_dups = how many training docs share the hash, leaked =
    * n_train_dups > 0) — the same annotate-then-filter contract as
    * [[Dedup.exact]]: `filter(col("leaked"))` materializes the leak set,
    * the unfiltered frame feeds clean-rate dashboards. Documents with
    * null text hash to null and never match (nothing meaningful leaks
    * from an empty page).
    *
    * Plan shape at 100 TB: hashing is map-side (text never shuffles —
    * the projection to (id, split, 32-hex hash) happens before any
    * exchange); the hash-group count and the probe join both
    * hash-partition on `content_hash`, so the aggregate output is
    * co-partitioned with the probe side and the join adds no extra
    * exchange. The mega-duplicate argument from [[Dedup.exact]] carries
    * over: the group count is map-side combining, so a 10⁸-duplicated
    * boilerplate page costs ~#tasks partial rows, not 10⁸. The corpus is
    * scanned twice (count branch + probe branch); a pipeline running
    * several hygiene passes should persist the hashed projection once. */
  def splitLeakageExact(df: DataFrame, textCol: String, idCol: String,
                        trainPct: Double, salt: String = ""): DataFrame = {
    val norm = graft.functions.TextNorm.nfcNormalize(
      lower(trim(regexp_replace(col(textCol), "\\s+", " "))))
    val hashed = split(df, idCol, trainPct, salt)
      .select(col(idCol), col("split"), md5(norm).as("content_hash"))
    val trainCounts = hashed
      .groupBy(col("content_hash"))
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L))
        .as("__n_train"))
      .filter(col("__n_train") > 0)
    hashed.filter(col("split") === "val")
      .join(trainCounts, Seq("content_hash"), "left")
      .withColumn("n_train_dups", coalesce(col("__n_train"), lit(0L)))
      .withColumn("leaked", col("n_train_dups") > 0)
      .select(col(idCol), col("content_hash"), col("n_train_dups"),
        col("leaked"))
  }

  /** Near-duplicate train→val leakage audit: validation documents whose
    * MinHash-LSH bands collide with at least one training document —
    * the paraphrase/boilerplate-variant leakage [[splitLeakageExact]]'s
    * byte hash cannot see (the within-corpus analogue of
    * [[Dedup.crossCorpusKeep]]'s benchmark-decontamination check).
    *
    * Emits (id, n_train_cands = distinct training docs sharing ≥1 band)
    * per SUSPECT validation doc; band collision is probabilistic, so
    * treat hits as candidates and confirm with an exact Jaccard pass
    * ([[Dedup.jaccardFrom]]) when precision matters. Docs shorter than
    * `shingleN` tokens have no signature and never flag — same
    * convention as [[Dedup.minhashLsh]].
    *
    * Plan shape at 100 TB: signatures are computed map-side by the
    * codegen'd MinHash kernel (no shuffle before banding; document text
    * never shuffles — only k×16-char signatures and their band hashes).
    * The val→train band join hash-partitions on (band, band_hash), with
    * bucket sizes bounding the pair blowup exactly as in LSH dedup; the
    * distinct-candidate count is a map-side-combining aggregate on the
    * val id. Both splits derive from one band-row lineage — persist it
    * when running leakage alongside other LSH consumers. */
  def splitLeakageNear(df: DataFrame, textCol: String, idCol: String,
                       trainPct: Double, shingleN: Int = 3, k: Int = 8,
                       bands: Int = 4, salt: String = ""): DataFrame = {
    val bandRows = split(
      Dedup.bandRows(df, textCol, idCol, shingleN, k, bands),
      idCol, trainPct, salt)
    val train = bandRows.filter(col("split") === "train")
      .select(col("band"), col("band_hash"), col(idCol).as("__train_id"))
    bandRows.filter(col("split") === "val")
      .select(col("band"), col("band_hash"), col(idCol))
      .join(train, Seq("band", "band_hash"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__train_id")).as("n_train_cands"))
  }

  /** Epoch allocation under a token budget — the data-constrained
    * planning step (Muennighoff et al., "Scaling Data-Constrained
    * Language Models", NeurIPS 2023 showed repeating data up to ~4
    * epochs is nearly as good as fresh tokens; past that returns decay
    * fast, so a budget should spill away from exhausted sources): given
    * a total training budget and target mixture weights, each source's
    * target is its weight share; a source whose target exceeds
    * `maxEpochs`× its unique tokens caps there and the shortfall is
    * reported (re-run with renormalized weights to spill it, an explicit
    * policy decision rather than silent redistribution).
    *
    * Output per source: `n_docs`, `n_tokens` (unique corpus tokens),
    * `target_tokens` (floor of the weight share), `served_tokens`
    * (capped), `epochs` (served/unique, 6 dp), `capped`, `shortfall`.
    * All counts are exact longs; the one division per source is
    * correctly rounded then 6-dp-fixed — engine-exact.
    *
    * Scale shape: ONE map-side-combined aggregate to |sources| rows;
    * everything after is arithmetic on that tiny frame (the weight share
    * attaches per-row from the plan-literal weight map — no second pass,
    * no driver collect). Feed `epochs` to a repeat-loader or expand via
    * [[mixtureSchedule]] keyed per epoch. */
  def epochAllocation(df: DataFrame, sourceCol: String, tokenCol: String,
                      budget: Long, weights: Seq[(String, Long)],
                      defaultWeight: Long = 1L,
                      maxEpochs: Double = 4.0): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    require(maxEpochs > 0, s"maxEpochs=$maxEpochs must be positive")
    require(defaultWeight >= 0, s"defaultWeight=$defaultWeight")
    weights.foreach { case (s, w) =>
      require(w >= 0, s"weight $w for source '$s' must be >= 0") }
    val wCol = weights.foldRight(lit(defaultWeight)) {
      case ((src, w), acc) =>
        when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    val all = Window.partitionBy(lit(1))
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol).cast("long")).as("n_tokens"))
      .withColumn("__w", wCol)
      .withColumn("__wtot", sum(col("__w")).over(all))
      .withColumn("target_tokens",
        floor(lit(budget).cast("double") * col("__w").cast("double")
          / col("__wtot").cast("double")).cast("long"))
      .withColumn("__cap",
        floor(lit(maxEpochs) * col("n_tokens").cast("double")).cast("long"))
      .withColumn("served_tokens",
        least(col("target_tokens"), col("__cap")))
      .withColumn("epochs",
        round(col("served_tokens").cast("double")
          / col("n_tokens").cast("double"), 6))
      .withColumn("capped", col("target_tokens") > col("__cap"))
      .withColumn("shortfall", col("target_tokens") - col("served_tokens"))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("served_tokens"), col("epochs"),
        col("capped"), col("shortfall"))
  }

  /** Water-filling budget allocation — [[epochAllocation]] WITH the
    * spill closed: sources that hit their `maxEpochs` capacity release
    * their surplus, which redistributes proportionally (by weight)
    * among the un-capped sources, in ONE pass via the classic sorted
    * threshold — no renormalize-and-re-run loop. The result is the
    * unique allocation a_i = min(capacity_i, λ·w_i) with Σa = min(B,
    * Σcapacity).
    *
    * == All-integer determinism ==
    * Sources sort by the exact-order key `capacity·10⁶ div weight`
    * (truncation cannot reorder two distinct ratios when weights ≤ 100
    * — their scaled gap is ≥ 10⁶/(w_i·w_j) ≥ 100), source name as the
    * tie-break. The cut point is the FIRST row where
    * `(B − prefix_cap)·w ≤ capacity·remaining_weight` (cross-multiplied
    * longs — no division), and proportional shares are integer
    * `(B − prefix_cap_cut)·w div remW_cut`. Σalloc ≤ B exactly;
    * truncation remainders (< #sources tokens) are intentionally left
    * unspent, never over-allocated.
    *
    * Scale shape: one map-side-combined aggregate to |sources| rows;
    * the threshold windows run single-partition over that PLANNING
    * frame — |sources| is dozens-to-hundreds by construction (mixture
    * labels), which is the point of planning on the aggregate. */
  def waterfillAllocation(df: DataFrame, sourceCol: String,
                          tokenCol: String, budget: Long,
                          weights: Seq[(String, Long)],
                          defaultWeight: Long = 1L,
                          maxEpochs: Double = 4.0): DataFrame = {
    require(budget > 0 && budget < 1000000000000000L,
      s"budget=$budget out of (0, 1e15)")
    require(maxEpochs > 0, s"maxEpochs=$maxEpochs must be positive")
    (weights.map(_._2) :+ defaultWeight).foreach(w =>
      require(w >= 1 && w <= 100, s"weight $w outside [1,100] (the " +
        "exact-sort-key bound)"))
    val wCol = weights.foldRight(lit(defaultWeight)) {
      case ((src, w), acc) =>
        when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    val agg = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol).cast("long")).as("n_tokens"))
      .withColumn("weight", wCol)
      .withColumn("capacity",
        floor(lit(maxEpochs) * col("n_tokens").cast("double")).cast("long"))
    val byRatio = Window.orderBy(
      expr("capacity * 1000000 div weight"), col(sourceCol))
    val rows = agg
      .withColumn("__rank", row_number().over(byRatio))
      .withColumn("__pc", coalesce(sum(col("capacity")).over(
        byRatio.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__rw", sum(col("weight")).over(
        byRatio.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("__flag",
        (lit(budget) - col("__pc")) * col("weight") <=
          col("capacity") * col("__rw"))
    val cut = broadcast(rows.filter(col("__flag"))
      .orderBy(col("__rank")).limit(1)
      .select(col("__rank").as("__cut"), col("__pc").as("__cpc"),
        col("__rw").as("__crw")))
    rows.join(cut, lit(true), "left")
      .withColumn("alloc_tokens",
        when(col("__cut").isNull || col("__rank") < col("__cut"),
          col("capacity"))
          .otherwise(expr(s"($budget - __cpc) * weight div __crw")))
      .withColumn("epochs", round(col("alloc_tokens").cast("double")
        / col("n_tokens").cast("double"), 6))
      .withColumn("at_cap", col("__cut").isNull ||
        col("__rank") < col("__cut"))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        col("weight"), col("capacity"), col("alloc_tokens"),
        col("epochs"), col("at_cap"))
  }
}
