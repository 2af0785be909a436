package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k of a (small) query set against
  *    the corpus — broadcast the queries, one map-side pass over the corpus,
  *    one shuffle for the per-query top-k. This is the correctness baseline
  *    and also the right 100 TB plan when |queries| is small: corpus is
  *    never shuffled, only (|queries| × k) rows leave the scan stage.
  *  - [[signLshTopK]]: sign-LSH bucketing (axis-aligned hyperplanes on the
  *    first `b` dimensions) so the self-/cross-join only touches same-bucket
  *    rows. The scale path when queries are the whole corpus.
  *
  * All dot products are computed in double (floats are widened first) so
  * results are reproducible across engines.
  */
object Similarity {

  /** Dot product over float/double array columns — a codegen'd Catalyst
    * expression ([[graft.functions.DotProduct]]): the O(pairs × dim) inner
    * loop of ANN scoring runs as a primitive `for` loop inside whole-stage
    * codegen instead of per-element lambda evaluation. Numerics identical
    * to the `aggregate(zip_with(...))` formulation (sequential left-fold in
    * double). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  /** cosine(a, b) over array columns, in double precision. A zero
    * vector has no direction: the score is NULL (matching DuckDB's
    * divide-by-zero null), not an ANSI DIVIDE_BY_ZERO error — a single
    * failed-embedding row must not kill a corpus-wide job, and null
    * scores fall out of every threshold filter and top-k downstream. */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom =!= 0.0, dot(a, b) / denom)
  }

  /** L2-normalize a vector column ONCE, map-side, so pair scoring is a
    * plain dot product — 3× fewer flops than cosine-per-pair, and at scale
    * the normalization fuses with the scan while the O(pairs) stage does
    * minimal work. Floats widen to double ([[graft.functions.L2Normalize]],
    * codegen'd; engine-portable). */
  def normalize(vec: Column): Column =
    graft.functions.VectorOps.l2normalize(vec)

  /** Exact top-k neighbors for each query row.
    * Output: (query_id, rank, neighbor_id, score). Ties broken by neighbor
    * id so ranking is deterministic. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     roundScore: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", dot(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), roundScore).as("score"))
  }

  /** Maximal-marginal-relevance diversified top-`selectK` (Carbonell &
    * Goldstein 1998): from each query's `candK` highest-cosine candidates,
    * greedily pick argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) — the
    * standard rerank that stops a retrieval slate (RAG context, dedup
    * review queue) from being `selectK` copies of the same passage. Pick 1
    * is the relevance argmax (S empty); ties break on neighbor id at every
    * step, so the slate is deterministic.
    *
    * Output: (query_id, pick ∈ 1..selectK, neighbor_id) — rank-only, the
    * ANN-family convention. Relevance is the 6-dp cosine from
    * [[bruteForceTopK]]; candidate-pair similarity is 9-dp-fixed; the MMR
    * score is one fixed double tree (λ and 1−λ from the same shared
    * literals in engine and oracle), so selection replays identically.
    *
    * Plan shape at 100 TB: candidate generation is the [[bruteForceTopK]]
    * map-side scan (swap in any ANN path for corpus-sized query sets —
    * the rerank only reads (query_id, neighbor_id, score) + vectors);
    * everything after is bounded by |queries| × candK² — the pair frame
    * equi-joins on query_id, and each of the selectK−1 greedy rounds is
    * one join + one candK-row window per query group, never corpus-sized.
    * Candidates and pairs are localCheckpointed ONCE so the greedy rounds
    * don't replay the scoring scan. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String,
                candK: Int, selectK: Int,
                lambda: Double = 0.5): DataFrame = {
    require(candK >= selectK && selectK >= 1,
      s"need candK=$candK >= selectK=$selectK >= 1")
    mmrRerankFrom(bruteForceTopK(corpus, queries, idCol, vecCol, candK),
      corpus, idCol, vecCol, selectK, lambda)
  }

  /** MMR over ANY candidate slate: `cand0` is a (query_id, rank,
    * neighbor_id, score) frame from whichever retrieval leg fits the
    * scale — [[bruteForceTopK]] (oracle-exact) or the [[ivfTopK]] /
    * [[signLshTopK]] / graph-walk legs (the 100 TB paths; the
    * `search_mmr_ivf` query is the IVF instantiation). Same
    * generator/re-ranker split as [[hardNegativesFrom]]: the greedy
    * diversification only reads the slate plus the candidates' vectors.
    * A query whose slate is smaller than `selectK` yields as many picks
    * as it has candidates. */
  def mmrRerankFrom(cand0: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, selectK: Int,
                    lambda: Double = 0.5): DataFrame = {
    require(selectK >= 1, s"selectK=$selectK must be >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda=$lambda out of [0,1]")
    val cand = cand0
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("score"))
      .localCheckpoint()
    val nv = corpus.select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("nv"))
    val candV = cand.join(nv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("score"), col("nv"))
    val a = candV.select(col("query_id"), col("neighbor_id").as("ida"),
      col("nv").as("va"))
    val b = candV.select(col("query_id"), col("neighbor_id").as("idb"),
      col("nv").as("vb"))
    val pairs = a.join(b, Seq("query_id"))
      .filter(col("ida") =!= col("idb"))
      .select(col("query_id"), col("ida"), col("idb"),
        round(dot(col("va"), col("vb")), 9).cast("decimal(28,9)").as("sim"))
      .localCheckpoint()
    var selected = cand.filter(col("rank") === 1)
      .select(col("query_id"), lit(1L).as("pick"), col("neighbor_id"))
    var remaining = cand.filter(col("rank") > 1)
      .select(col("query_id"), col("neighbor_id"), col("score"))
    for (r <- 2 to selectK) {
      val ms = pairs
        .join(selected.select(col("query_id"), col("neighbor_id").as("idb")),
          Seq("query_id", "idb"))
        .groupBy(col("query_id"), col("ida").as("neighbor_id"))
        .agg(max(col("sim")).as("maxsim"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("mmr").desc, col("neighbor_id"))
      val pick = remaining.join(ms, Seq("query_id", "neighbor_id"))
        .withColumn("mmr", lit(lambda) * col("score") -
          lit(1.0 - lambda) * col("maxsim").cast("double"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("query_id"), lit(r.toLong).as("pick"),
          col("neighbor_id"))
      selected = selected.unionByName(pick)
      remaining = remaining.join(
        pick.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti")
    }
    selected
  }

  /** Hard-negative mining for embedding/reranker training: per query,
    * the `k` highest-cosine candidates whose LABEL differs from the
    * query's — the near-misses that teach a model the decision boundary
    * (random negatives are trivially far; these are the ones it
    * actually confuses). The standard curation step for contrastive
    * training sets (DPR/SBERT recipe: in-batch randoms + mined hard
    * negatives).
    *
    * Plan shape: candidate generation is [[bruteForceTopK]] over candK —
    * the oracle-exact eval leg; at 100 TB mine from an ANN slate instead
    * via [[hardNegativesFrom]] (IVF/graph-walk candidates, this brute leg
    * kept as the recall baseline, the [[recallAtK]] eval pattern).
    * Deterministic: 6-dp scores, ties on neighbor id.
    *
    * Output: (query_id, hn_rank 1..k, neighbor_id, score). Queries
    * whose whole candidate slate shares their label yield fewer than
    * `k` rows — mine with a bigger candK, not a weaker filter. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    candK: Int, k: Int): DataFrame = {
    require(candK >= k && k >= 1, s"need candK=$candK >= k=$k >= 1")
    hardNegativesFrom(bruteForceTopK(corpus, queries, idCol, vecCol, candK),
      corpus, queries, idCol, labelCol, k)
  }

  /** Hard-negative re-rank over ANY candidate slate: `cand` is a
    * (query_id, …, neighbor_id, score) frame from whichever retrieval leg
    * fits the scale — [[bruteForceTopK]] (oracle-exact), [[ivfTopK]] /
    * [[signLshTopK]] / [[graphSearchTopKSeeded]] (the 100 TB paths). The
    * generator/re-ranker split is the point: mining quality is measured
    * by [[recallAtK]] of the ANN-mined slate against the brute-mined one
    * (the `ann_hard_negatives_ivf` query), so the cheap leg's recall is
    * a number, not a hope.
    *
    * Join shape: the query-label attach broadcasts (a label column for
    * the query SAMPLE — small by the mining setup); the corpus-label
    * attach is a plain equi-join on neighbor_id with NO broadcast hint —
    * for a corpus-scale query set the |queries|×candK slate would blow a
    * forced broadcast, so AQE picks broadcast only when the slate
    * actually fits (it does for sampled queries). The re-rank window
    * runs per query on ≤ candK rows. */
  def hardNegativesFrom(cand: DataFrame, corpus: DataFrame,
                        queries: DataFrame, idCol: String, labelCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val withQ = cand.select(col("query_id"), col("neighbor_id"),
        col("score"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(labelCol).as("__qlab"))), Seq("query_id"))
    val nl = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__nlab"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    nl.join(withQ, Seq("neighbor_id"))
      .filter(col("__nlab") =!= col("__qlab"))
      .withColumn("hn_rank", row_number().over(w).cast("long"))
      .filter(col("hn_rank") <= k)
      .select(col("query_id"), col("hn_rank"), col("neighbor_id"),
        col("score"))
  }

  /** Bucket key from the signs of the first `b` vector components —
    * axis-aligned hyperplanes. Kept as the zero-multiply fallback; the
    * DEFAULT family is [[signBucketRotated]], because axis-aligned signs
    * collapse quietly on embeddings whose leading dimensions are
    * correlated (most learned embeddings). */
  def signBucket(vec: Column, b: Int): Column =
    concat((0 until b).map(i =>
      when(element_at(vec, i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** Default seed for the rotation family — any fixed value works; what
    * matters is that corpus and queries hash with the SAME planes. */
  val DefaultSeed: Long = 0x5DEECE66DL

  /** `b` seeded pseudo-random hyperplanes over `dim` components, each
    * coefficient drawn from splitmix64 → [-1, 1). Deterministic in
    * (b, dim, seed), so the planes can be re-generated identically by an
    * oracle (or another engine) — no fitted state to ship. */
  def rotationPlanes(b: Int, dim: Int,
                     seed: Long = DefaultSeed): IndexedSeq[Array[Double]] = {
    var x = seed
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    IndexedSeq.fill(b)(Array.fill(dim)(
      (next() >>> 11) * (2.0 / (1L << 53)) - 1.0))
  }

  /** Johnson–Lindenstrauss-style random projection to `dimOut`
    * dimensions: component j = ⟨vec, plane_j⟩ / √dimOut against the same
    * seeded deterministic planes as [[signBucketRotated]]. The standard
    * cheap dimensionality reduction before clustering/ANN — pairwise
    * distances are preserved in expectation, and a 64→8 projection cuts
    * every downstream distance computation 8×.
    *
    * Map-side only: `dimOut` codegen'd dot products against FOLDABLE
    * literal planes, no shuffle at any scale. Vectors shorter than
    * `dimIn` degrade OUT (same posture as [[signLshTopK]]/[[ivfTopK]]).
    * Components round to 6 dp — the fold order and the √dimOut scale
    * constant are identical in any IEEE engine. */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
                       dimIn: Int, dimOut: Int,
                       seed: Long = DefaultSeed): DataFrame = {
    require(dimIn > 0 && dimOut > 0, s"dimIn=$dimIn, dimOut=$dimOut")
    val planes = rotationPlanes(dimOut, dimIn, seed)
    val scale = 1.0 / math.sqrt(dimOut.toDouble)
    val comps = planes.map(p =>
      round(dot(col(vecCol), typedlit(p.toSeq)) * lit(scale), 6))
    df.filter(size(col(vecCol)) >= dimIn)
      .select(col(idCol), array(comps: _*).as("projected"))
  }

  /** Sign-LSH bucket from `b` random-rotation hyperplanes: bit i =
    * sign(⟨vec, plane_i⟩). The dot products run in the codegen'd
    * [[dot]] kernel against FOLDABLE array literals — map-side only, and
    * invariant to which dimensions of the embedding carry variance
    * (the axis-aligned family's failure mode). */
  def signBucketRotated(vec: Column, b: Int, dim: Int,
                        seed: Long = DefaultSeed): Column = {
    val planes = rotationPlanes(b, dim, seed)
    concat(planes.map(p =>
      when(dot(vec, typedlit(p.toSeq)) >= 0, lit("1")).otherwise(lit("0"))): _*)
  }

  /** `bits`-bit binary sign fingerprint packed into ONE BIGINT: bit i =
    * sign(⟨vec, plane_i⟩) against the same seeded rotation family as
    * [[signBucketRotated]] (random-hyperplane LSH, so Hamming distance
    * between fingerprints estimates angular distance: E[h] =
    * bits·θ/π). The point at 100 TB is the REPRESENTATION: an
    * 8-byte word per vector instead of dim×4 bytes — a billion
    * fingerprints fit where four million float vectors did, turning
    * candidate generation into a memory-bandwidth-bound integer scan.
    * ≤ 62 bits so the word stays positive in any engine's signed 64-bit
    * integer (no sign-bit portability hazard). Map-side only; exact
    * powers of two sum without rounding. */
  def hammingWord(vec: Column, dim: Int, bits: Int = 48,
                  seed: Long = DefaultSeed): Column = {
    require(bits >= 1 && bits <= 62, s"bits=$bits out of [1,62]")
    // one codegen'd kernel, NOT `bits` composed dot/CASE expressions:
    // the composed tree's generated method outgrows the JIT's huge-
    // method threshold at bits = 48 and the scan drops to interpreted
    // bytecode (~100× on the corpus pass this word exists to speed up) —
    // see [[graft.functions.SignFingerprint]]
    graft.functions.VectorOps.signFingerprint(vec,
      rotationPlanes(bits, dim, seed).toArray)
  }

  /** ANN over binary fingerprints: per query, the `k` corpus vectors of
    * smallest Hamming distance bit_count(cw XOR qw) — the binary
    * serving regime that completes the family (brute float scan →
    * LSH/IVF pruning → PQ codes → THIS: one codegen'd popcount per
    * candidate over 8-byte words). All-integer scores, ties on neighbor
    * id, so ranking replays engine-exactly — no float leg anywhere.
    *
    * Plan shape: fingerprints build map-side ([[hammingWord]]); the
    * scan is a broadcast product of corpus words with the query-sample
    * words (the [[bruteForceTopK]] posture but 8 bytes/row and an
    * XOR+popcount instead of a dim-length dot) and a per-query top-k
    * window. For corpus-scale query sets, prefix-bucket the words
    * (e.g. their high 16 bits) into an equi-join first — same trade as
    * every blocking leg. Output: (query_id, rank, neighbor_id,
    * hamming). Vectors shorter than `dim` degrade out (the
    * [[ivfTopK]]/[[signLshTopK]] posture). */
  def hammingTopK(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int, dim: Int,
                  bits: Int = 48, seed: Long = DefaultSeed): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val okLen = size(col(vecCol)) >= dim
    val q = queries.filter(okLen).select(col(idCol).as("query_id"),
      hammingWord(col(vecCol), dim, bits, seed).as("qw"))
    val c = corpus.filter(okLen).select(col(idCol).as("neighbor_id"),
      hammingWord(col(vecCol), dim, bits, seed).as("cw"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming",
        expr("cast(bit_count(cw ^ qw) as bigint)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("hamming"))
  }

  /** BLOCKED Hamming top-k — the corpus-scale shape of [[hammingTopK]]:
    * fingerprints bucket by their HIGH `prefixBits` bits (word >>
    * (bits−prefixBits)), a query probes its own bucket plus the
    * `prefixBits` buckets at prefix-Hamming distance 1 (multi-probe, the
    * [[signLshTopK]] idea in fingerprint space), and candidates rank by
    * popcount within the probed buckets. The full scan touches every
    * corpus word per query; this touches (prefixBits+1)/2^prefixBits of
    * the corpus — the blocking recall trade, measured against the
    * full-scan baseline by `ann_hamming_blocked`. At write time bucket
    * IS a partition/cluster key, so a query batch reads only its probed
    * partitions. All-integer end to end; corpus lands in exactly ONE
    * bucket (plan shape unchanged on the big side).
    *
    * The bucket join carries NO broadcast hint — deliberately, unlike
    * [[hammingTopK]]'s brute eval scan: this is the path meant for
    * query batches up to corpus scale, where a forced broadcast of the
    * (prefixBits+1)×-exploded probe frame would blow the driver. AQE
    * sizes the join at runtime (tiny probe batch → broadcast hash join,
    * the [[hardNegativesFrom]] posture; corpus-scale batch → shuffled
    * join on the bucket, both sides already keyed). */
  def hammingTopKBlocked(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, k: Int, dim: Int,
                         bits: Int = 48, prefixBits: Int = 8,
                         seed: Long = DefaultSeed): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(prefixBits >= 1 && prefixBits < bits,
      s"prefixBits=$prefixBits out of [1, bits=$bits)")
    val shift = bits - prefixBits
    val okLen = size(col(vecCol)) >= dim
    val c = corpus.filter(okLen).select(col(idCol).as("neighbor_id"),
        hammingWord(col(vecCol), dim, bits, seed).as("cw"))
      .withColumn("bucket", expr(s"cw >> $shift"))
    val probes = expr(s"qw >> $shift") +:
      (0 until prefixBits).map(i => expr(s"(qw >> $shift) ^ ${1L << i}"))
    val q = queries.filter(okLen).select(col(idCol).as("query_id"),
        hammingWord(col(vecCol), dim, bits, seed).as("qw"))
      .withColumn("bucket", explode(array(probes: _*)))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming",
        expr("cast(bit_count(cw ^ qw) as bigint)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("hamming"))
  }

  /** Materialize the binary-ANN index [[hammingTopKBlocked]]'s scaladoc
    * promises: the (neighbor_id, cw) fingerprint table written
    * PARTITIONED BY the prefix bucket, so the bucket IS a directory key
    * and a probe batch lists/reads ONLY its probed partitions. One
    * map-only encode pass over the corpus (8 bytes + id per row); the
    * `partitionBy` write groups rows into at most 2^prefixBits
    * directories — at 100 TB each bucket partition is still
    * multi-file-parallel, and the write shuffles nothing (fingerprint
    * and bucket are row-local). */
  def writeHammingIndex(corpus: DataFrame, idCol: String, vecCol: String,
                        path: String, dim: Int, bits: Int = 48,
                        prefixBits: Int = 8,
                        seed: Long = DefaultSeed): Unit = {
    require(prefixBits >= 1 && prefixBits < bits,
      s"prefixBits=$prefixBits out of [1, bits=$bits)")
    val shift = bits - prefixBits
    corpus.filter(size(col(vecCol)) >= dim)
      .select(col(idCol).as("neighbor_id"),
        hammingWord(col(vecCol), dim, bits, seed).as("cw"))
      .withColumn("bucket", expr(s"cw >> $shift"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
  }

  /** Compact an over-fragmented partitioned index store IN PLACE —
    * the maintenance half of the streaming-ingest story: every
    * `stream_hamming` micro-batch appends one file per touched bucket
    * partition, and at ingest rates the accumulating small files erode
    * the pruned-read win the layout exists for (listing cost, footer
    * overhead, task fan-out). This rewrites ONLY the partitions whose
    * parquet file count exceeds `maxFilesPerBucket`: the read is
    * partition-pruned to those keys, the rewrite is a DYNAMIC
    * partition overwrite (untouched partitions keep their files
    * byte-for-byte), and each rewritten partition lands as one file
    * per holding task (≤ 1 here: `repartition(partitionCol)` puts a
    * key's rows in exactly one task). Never a full-store rewrite.
    *
    * The over-threshold slice is `localCheckpoint`ed (materialized)
    * BEFORE the overwrite — the write must not stream from the very
    * files it is replacing. Serving is byte-identical before/after
    * (pinned in BucketingSpec: same probe rows, file count bounded).
    * Works for any of the stores here (`bucket` or `cell` partition
    * columns, long/int/string keys). Returns the rewritten partition
    * keys (empty ⇒ nothing exceeded the threshold, nothing written).
    *
    * CONCURRENCY CONTRACT — run with ingest quiesced: a plain parquet
    * directory has no transaction log, so a micro-batch appending into
    * a partition BETWEEN this function's snapshot read and its
    * overwrite commit would be silently replaced by the pre-append
    * snapshot (lost rows, no error). Schedule compaction between
    * micro-batches (foreachBatch, or a maintenance window on the
    * ingest trigger) — the standard posture for log-less file stores;
    * a Delta/Iceberg-backed store lifts the restriction with optimistic
    * commit conflict detection (the USAGE.md lakehouse swap). Concurrent
    * READERS are safe at parquet-task granularity but a probe spanning
    * the swap may see a partition mid-replacement — serve from a
    * snapshot path or quiesce reads too if that matters.
    *
    * CRASH WINDOW — same log-less-store root cause, different victim:
    * dynamic partition overwrite commits by DELETING each target
    * partition directory and renaming the staged replacement in; a
    * driver/JVM failure between the delete and the rename loses that
    * partition's data (readers see an empty or missing bucket — no
    * error, no marker). The window is job-commit-sized (small), but
    * durability-critical stores should either take a directory
    * snapshot first or use the Delta/Iceberg swap, whose atomic log
    * commit closes the window outright. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   partitionCol: String,
                   maxFilesPerBucket: Int): Seq[String] = {
    require(maxFilesPerBucket >= 1,
      s"maxFilesPerBucket=$maxFilesPerBucket must be >= 1")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = partitionCol + "="
    // directory names are Hive-ESCAPED value strings ('a b' stores as
    // 'a%20b'): unescape before comparing against column values, and
    // skip the null partition outright (no literal equals NULL, and
    // its marker string would crash the numeric coercions below)
    val over = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .filter(p => fs.listStatus(p.getPath).count(f =>
        f.isFile && f.getPath.getName.startsWith("part-"))
        > maxFilesPerBucket)
      .map(p => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(p.getPath.getName.substring(prefix.length)))
      .filter(_ != "__HIVE_DEFAULT_PARTITION__").toSeq.sorted
    if (over.isEmpty) return Nil
    val store = spark.read.parquet(path)
    // unescaped names are still strings; coerce to the inferred
    // partition dtype so the IN-list stays a PartitionFilters prune
    // (the typedKeys rule)
    val keys: Seq[Any] = store.schema(partitionCol).dataType match {
      case org.apache.spark.sql.types.LongType => over.map(_.toLong)
      case org.apache.spark.sql.types.IntegerType => over.map(_.toInt)
      case _ => over
    }
    val slice = store.filter(col(partitionCol).isin(keys: _*))
      .repartition(col(partitionCol))
      .localCheckpoint() // materialize before replacing the source files
    // report only keys that actually land in the rewrite: a dir whose
    // unescaped name matches no rows (shouldn't happen, but e.g. a
    // hand-made directory) is NOT overwritten by the dynamic commit
    // and must not be claimed as compacted. The comparison runs on the
    // TYPED key values used in the IN-list (r14 advice) — exact for any
    // partition dtype the coercion above covers (long/int/string, the
    // stores' universe); the cast-to-string fallback keeps exotic
    // inferable types (date/timestamp/decimal) best-effort, where
    // Spark's string rendering may differ from the directory-name format.
    val dvals = slice
      .select(col(partitionCol), col(partitionCol).cast("string"))
      .distinct().collect()
    val typedVals = dvals.map(_.get(0)).toSet
    val strVals = dvals.map(_.getString(1)).toSet
    slice.write.option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy(partitionCol).parquet(path)
    keys.zip(over).collect {
      case (k, name) if typedVals.contains(k) || strVals.contains(name) =>
        name
    }
  }

  /** [[hammingTopKBlocked]] served from a [[writeHammingIndex]] store:
    * identical probe set, scoring and ranking — but the corpus side is
    * the PARTITIONED fingerprint table restricted by a LITERAL bucket
    * IN-list, so the probed buckets become `PartitionFilters` on the
    * scan and unprobed partitions are never listed or read (pinned in
    * BucketingSpec). The probe-set collect is bounded by the BUCKET
    * DOMAIN, not the query count: ≤ min(|Q|·(prefixBits+1),
    * 2^prefixBits) longs — at the default 8 prefix bits that is ≤ 256
    * values regardless of corpus or batch size, the same
    * driver-footprint class as the centroid/codebook collects. Results
    * are row-identical to [[hammingTopKBlocked]] on the same corpus
    * (`ann_hamming_indexed` shares `ann_hamming_blocked`'s oracle).
    *
    * EAGER at construction time (r12 advice, documented contract): the
    * query-side fingerprints are localCheckpointed and the probe-bucket
    * IN-list is collected BEFORE this returns, so the returned frame is
    * partially executed, its partition-filter set is frozen at build
    * time (new queries need a new call), and the probe-side cost lands
    * in plan construction rather than first action — callers timing the
    * serving read get exactly the pruned scan, which is the point. */
  def hammingTopKIndexed(indexed: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, k: Int, dim: Int,
                         bits: Int = 48, prefixBits: Int = 8,
                         seed: Long = DefaultSeed): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(prefixBits >= 1 && prefixBits < bits,
      s"prefixBits=$prefixBits out of [1, bits=$bits)")
    val shift = bits - prefixBits
    val probes = expr(s"qw >> $shift") +:
      (0 until prefixBits).map(i => expr(s"(qw >> $shift) ^ ${1L << i}"))
    val (q, c) = probedStore(indexed,
      queries.filter(size(col(vecCol)) >= dim)
        .select(col(idCol).as("query_id"),
          hammingWord(col(vecCol), dim, bits, seed).as("qw"))
        .withColumn("bucket", explode(array(probes: _*))),
      "bucket")
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming",
        expr("cast(bit_count(cw ^ qw) as bigint)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("hamming"))
  }

  /** The standard two-stage binary serving path: a `candK` Hamming
    * shortlist over the 8-byte fingerprints ([[hammingTopK]]), then an
    * exact-cosine re-rank of ONLY the shortlist down to `k` — popcount
    * does the corpus-wide scan, the float kernel touches |queries|×candK
    * rows. This is how binary signatures are actually deployed (the
    * fingerprint alone quantizes away most of the top-k ordering;
    * re-ranking restores it at shortlist-bounded cost — measure with
    * the `ann_hamming_rerank` recall query). Same output shape and
    * determinism discipline as [[bruteForceTopK]]. */
  def hammingRerankTopK(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int, candK: Int,
                        dim: Int, bits: Int = 48,
                        seed: Long = DefaultSeed): DataFrame = {
    require(candK >= k && k >= 1, s"need candK=$candK >= k=$k >= 1")
    val cand = hammingTopK(corpus, queries, idCol, vecCol, candK, dim,
      bits, seed)
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("cv"))
    val qv = queries.filter(size(col(vecCol)) >= dim)
      .select(col(idCol).as("query_id"), normalize(col(vecCol)).as("qv"))
    val scored = cand.select(col("query_id"), col("neighbor_id"))
      .join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("score", dot(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** ANN via sign-LSH: candidates share the query's bucket; top-k within.
    * Recall is tunable with `b` (fewer bits → bigger buckets → higher
    * recall, more compute). `rotatedDim = Some(d)` (the default posture for
    * learned embeddings) buckets with [[signBucketRotated]] over the first
    * `d` components; `None` falls back to axis-aligned signs.
    *
    * `multiProbe = true` additionally probes, per query, every bucket at
    * hamming distance 1 from its own (multi-probe LSH, Lv et al. VLDB'07):
    * b+1 probes ⇒ ~(b+1)× candidates on the query side only — the CORPUS
    * still lands in exactly one bucket each, so the big side's plan shape
    * is unchanged. On the driver fixture this lifts top-3 recall ~3× over
    * single-probe regardless of seed. Returns same shape as
    * [[bruteForceTopK]]. */
  def signLshTopK(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int, b: Int,
                  rotatedDim: Option[Int] = None,
                  seed: Long = DefaultSeed,
                  multiProbe: Boolean = false,
                  roundScore: Int = 6): DataFrame = {
    def bits(vec: Column): Seq[Column] = rotatedDim match {
      case Some(dim) =>
        rotationPlanes(b, dim, seed).map(p => dot(vec, typedlit(p.toSeq)) >= 0)
      case None => (0 until b).map(i => element_at(vec, i + 1) >= 0)
    }
    def render(bs: Seq[Column]): Column =
      concat(bs.map(bt => when(bt, lit("1")).otherwise(lit("0"))): _*)
    // the axis family indexes components 1..b (ANSI: out-of-bounds kills
    // the job); the rotated family would silently prefix-bucket a short
    // vector. Same posture as ivfTopK: too-short vectors degrade OUT of
    // the index on both sides rather than crashing or mis-bucketing.
    val okLen = size(col(vecCol)) >= rotatedDim.getOrElse(b)
    val c = corpus.filter(okLen).select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("cv"),
      render(bits(col(vecCol))).as("bucket"))
    // queries: materialize the bit columns once, then explode the probe set
    val q0 = queries.filter(okLen).select(
      col(idCol).as("query_id") +: normalize(col(vecCol)).as("qv") +:
        bits(col(vecCol)).zipWithIndex.map { case (bc, i) => bc.as(s"__b$i") }: _*)
    val bitRefs = (0 until b).map(i => col(s"__b$i"))
    def probe(flip: Int): Column = render(
      bitRefs.zipWithIndex.map { case (bt, i) => if (i == flip) !bt else bt })
    val probes =
      if (multiProbe) probe(-1) +: (0 until b).map(probe)
      else Seq(probe(-1))
    // array_distinct: a null BIT (null embedding element upstream) makes a
    // flipped probe render identically to the unflipped one — deduping the
    // probe set keeps the bucket join from emitting duplicate neighbors
    val q = q0.select(col("query_id"), col("qv"),
      explode(array_distinct(array(probes: _*))).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", dot(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), roundScore).as("score"))
  }

  /** IVF-style coarse quantization over the first `m` components: cell =
    * 2·(argmax |vᵢ|) + sign(v_argmax). Deterministic (smallest index wins
    * ties) and engine-portable; swapping in trained k-means centroids
    * changes only this expression. Returns (winnerCell, runnerUpCell). */
  def axisCells(vec: Column, m: Int): (Column, Column) = {
    require(m >= 2, s"axisCells needs m >= 2 (got $m): the runner-up cell " +
      "is the argmax over the remaining components")
    def a(i: Int): Column = abs(element_at(vec, i + 1).cast("double"))
    def argmaxOver(idxs: Seq[Int]): Column = idxs match {
      case Seq(last) => lit(last)
      case h +: t =>
        when(t.map(j => a(h) >= a(j)).reduce(_ && _), lit(h))
          .otherwise(argmaxOver(t))
    }
    def cellOf(idx: Column): Column =
      (idx * 2 + when(element_at(vec, idx + 1) >= 0, 1).otherwise(0))
        .cast("int")
    val win = argmaxOver(0 until m)
    val runner = (0 until m).map(w =>
      (w, argmaxOver((0 until m).filterNot(_ == w))))
      .foldLeft(lit(-1)) { case (acc, (w, c)) =>
        when(win === w, c).otherwise(acc)
      }
    (cellOf(win), cellOf(runner))
  }

  /** ANN via IVF probing: each corpus vector lives in exactly ONE cell of
    * the coarse quantizer; a query scores candidates in its own cell plus
    * its runner-up cell (`probes` ∈ {1,2}).
    *
    * The 100 TB plan: bucket/partition the corpus by `cell` once at write
    * time; a query batch shuffles only the (broadcast) queries, each query
    * reads `probes` partitions, and the per-cell top-k is a bounded
    * partial-aggregation. Same output shape as [[bruteForceTopK]].
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              m: Int = 4, probes: Int = 2,
              roundScore: Int = 6): DataFrame = {
    require(probes >= 1 && probes <= 2, s"probes=$probes not in 1..2")
    val (cw, cr) = axisCells(col(vecCol), m)
    // axisCells indexes components 1..m; under ANSI mode a shorter vector
    // would fail the whole job with ARRAY_INDEX_OUT_OF_BOUNDS. Validate
    // up front: too-short vectors degrade out of the index instead of
    // killing it (callers wanting them ranked should impute/pad first).
    val okLen = size(col(vecCol)) >= m
    val q = queries.filter(okLen).select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"),
      explode(array(Seq(cw, cr).take(probes): _*)).as("cell"))
    val c = corpus.filter(okLen).select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("cv"), cw.as("cell"))
    cellCosineRank(c, broadcast(q), k, roundScore)
  }

  /** The shared cell-join cosine ranker behind the IVF family — ONE
    * copy of the join/self-exclusion/score/window body, so the axis
    * and trained quantizers (and their materialized-store variants)
    * can never diverge on scoring or tie-break semantics. `c` carries
    * (neighbor_id, cv, cell); `q` carries (query_id, qv, cell) —
    * pre-wrapped in `broadcast()` by the eval legs with sampled query
    * sets, hint-free from the indexed serving paths (AQE sizes those,
    * the [[hammingTopKBlocked]] posture). */
  private def cellCosineRank(c: DataFrame, q: DataFrame, k: Int,
                             roundScore: Int): DataFrame = {
    val scored = c.join(q, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", dot(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), roundScore).as("score"))
  }

  /** Materialize [[ivfTopK]]'s "partition the corpus by cell at write
    * time" plan: the normalized-vector table written PARTITIONED BY the
    * coarse cell — one map-only pass (normalize + argmax cell are
    * row-local, the write shuffles nothing), at most 2m directories.
    * The float-regime sibling of [[writeHammingIndex]]. */
  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    path: String, m: Int = 4): Unit = {
    val (cw, _) = axisCells(col(vecCol), m)
    corpus.filter(size(col(vecCol)) >= m)
      .select(col(idCol).as("neighbor_id"),
        normalize(col(vecCol)).as("cv"), cw.as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
  }

  /** [[ivfTopK]] served from a [[writeIvfIndex]] store: identical
    * probing, scoring and ranking, but the corpus side is the
    * partitioned table restricted by a LITERAL cell IN-list — the
    * probed cells become `PartitionFilters` on the scan, so a query
    * batch reads `probes` partitions per query and never lists the
    * rest. The IN-list collect is bounded by the CELL DOMAIN (≤ 2m
    * ints — 8 at the default), independent of batch and corpus size.
    * Hint-free join (the [[hammingTopKIndexed]] posture): AQE
    * broadcasts a small probe batch, shuffles a corpus-scale one.
    * Row-identical to [[ivfTopK]] on the same corpus
    * (`ann_ivf_indexed` shares `ann_ivf_topk`'s oracle).
    *
    * EAGER at construction time, like [[hammingTopKIndexed]]: the query
    * cells are localCheckpointed and the probe IN-list collected before
    * this returns — the returned frame is partially executed and its
    * partition-filter set frozen at build time. */
  def ivfTopKIndexed(indexed: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     m: Int = 4, probes: Int = 2,
                     roundScore: Int = 6): DataFrame = {
    require(probes >= 1 && probes <= 2, s"probes=$probes not in 1..2")
    val (cw, cr) = axisCells(col(vecCol), m)
    val (q, c) = probedStore(indexed,
      queries.filter(size(col(vecCol)) >= m)
        .select(col(idCol).as("query_id"),
          normalize(col(vecCol)).as("qv"),
          explode(array(Seq(cw, cr).take(probes): _*)).as("cell")),
      "cell")
    cellCosineRank(c, q, k, roundScore)
  }

  // ------------------------------------------------ trained-centroid IVF

  /** Train the coarse quantizer for the REAL IVF family (the FAISS
    * `IVFx` coarse stage): k-means centroids over the corpus via
    * [[Clustering.trainCentroids]]'s dyadic-grid Lloyd loop — engine-
    * exact (exact component sums in any order, first-min argmin, the
    * `embed_kmeans` discipline), so an oracle replays the training
    * round for round. Returns the k×dim centroid table; it rides as
    * plan literals in the cell/probe expressions (k×dim doubles — the
    * same driver-footprint class as the PQ codebooks).
    *
    * This lifts the axis-cell scheme's `probes ≤ 2` cap: axis cells
    * have no distance ranking beyond winner/runner-up, but trained
    * centroids rank by the actual quantizer distance, so a query can
    * probe its p nearest cells for any p ≤ k. */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                        k: Int, iters: Int,
                        dim: Int): IndexedSeq[Array[Double]] = {
    require(k >= 2 && iters >= 1, s"k=$k, iters=$iters out of range")
    val base = corpus.filter(size(col(vecCol)) === dim)
      .select(col(idCol).as("__id"), Clustering.quantize(col(vecCol)).as("__w"))
    Clustering.trainCentroids(base, k, iters, dim)
  }

  /** The query's `probes` nearest trained cells, as an array of cell
    * ids: sort the (score, index) structs — struct comparison is
    * field-by-field, so ties break on the LOWEST index, matching the
    * kmeans argmin — and take the first p. Cell scoring runs on the
    * dyadic-quantized vector exactly like the kmeans assignment, so
    * the probe ranking replays in the oracle. */
  private[graft] def trainedProbeCells(vec: Column,
      centroids: IndexedSeq[Array[Double]], probes: Int): Column =
    transform(
      slice(array_sort(Clustering.scoreStructs(
        Clustering.quantize(vec), centroids)), 1, probes),
      x => x.getField("j").cast("int"))

  /** ANN via TRAINED-centroid IVF probing: each corpus vector lives in
    * its argmin-centroid cell; a query scores candidates in its
    * `probes` NEAREST cells (ranked by the quantizer distance — the
    * ranking axis cells don't have). Same output shape, determinism
    * and join posture as [[ivfTopK]]; the eval leg that
    * `ann_ivft_recall` compares against the axis-cell path at equal
    * probes. Vectors not exactly `dim` long degrade out (the kmeans
    * universe — training, cells and probes all share it). */
  def ivfTrainedTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String,
                     centroids: IndexedSeq[Array[Double]], k: Int,
                     probes: Int, dim: Int,
                     roundScore: Int = 6): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(probes >= 1 && probes <= centroids.length,
      s"probes=$probes out of [1, ${centroids.length}]")
    val okLen = size(col(vecCol)) === dim
    val q = queries.filter(okLen).select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"),
      explode(trainedProbeCells(col(vecCol), centroids, probes)).as("cell"))
    val c = corpus.filter(okLen).select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("cv"),
      element_at(trainedProbeCells(col(vecCol), centroids, 1), 1).as("cell"))
    cellCosineRank(c, broadcast(q), k, roundScore)
  }

  /** Materialize the trained-IVF layout: normalized vectors written
    * PARTITIONED BY the argmin-centroid cell — the [[writeIvfIndex]]
    * pattern with kmeans cells instead of axis cells. One map-only
    * pass (the centroids are plan literals, cell assignment is
    * row-local), at most k directories, the write shuffles nothing.
    *
    * The store is SELF-DESCRIBING: the quantizer that defines the cell
    * partitions is persisted alongside them ([[writeIvfQuantizer]] —
    * the `_quantizer/` sidecar), so a cold session can serve the store
    * with [[loadIvfQuantizer]] + [[ivfTrainedTopKIndexed]] without
    * retraining. Retraining against a drifted corpus would assign
    * probes from DIFFERENT centroids than the partitions were written
    * under — silent recall loss, no error — which is why the quantizer
    * must travel with the data (the FAISS index file ships its coarse
    * quantizer for the same reason). */
  def writeIvfTrainedIndex(corpus: DataFrame, idCol: String,
                           vecCol: String, path: String,
                           centroids: IndexedSeq[Array[Double]],
                           dim: Int): Unit = {
    corpus.filter(size(col(vecCol)) === dim)
      .select(col(idCol).as("neighbor_id"),
        normalize(col(vecCol)).as("cv"),
        element_at(trainedProbeCells(col(vecCol), centroids, 1), 1)
          .as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    // AFTER the store write: overwrite mode clears the root directory.
    // Crash between the two commits leaves a sidecar-less store — an
    // interrupted write, not corruption; see writeIvfQuantizer's
    // crash-window note (loaders fail loudly; re-run the write).
    writeIvfQuantizer(corpus.sparkSession, path, centroids)
  }

  /** Persist the coarse quantizer INSIDE the store directory as a
    * `_quantizer/` parquet sidecar of (cell, centroid) rows — the
    * leading underscore keeps it invisible to `spark.read.parquet(
    * store)` and to partition discovery (the `_metadata`/`_SUCCESS`
    * hidden-path convention), so serving reads are unchanged; only a
    * deliberate [[loadIvfQuantizer]] sees it. k×dim doubles — one
    * file, one row group; parquet round-trips doubles bit-exactly.
    * [[compactIndex]]'s dynamic overwrite touches only `cell=` dirs,
    * so compaction preserves the sidecar.
    *
    * WRITE-ORDER CRASH WINDOW (r14 advice, documented at every store
    * write site): the data partitions are written FIRST — overwrite
    * mode clears the root, so the sidecar cannot precede them — and a
    * driver/JVM failure between the data commit and this sidecar write
    * leaves a data-complete store with NO sidecar. That state is an
    * INTERRUPTED WRITE, not corruption: the cold loaders fail loudly on
    * the missing path (by design — serving with a guessed quantizer
    * would be the silent failure), and the remedy is to re-run the
    * store write (or just the sidecar write, if the quantizer is still
    * in hand). A Delta/Iceberg-backed store closes the window with an
    * atomic log commit — the same USAGE.md lakehouse swap that closes
    * [[compactIndex]]'s delete/rename window. */
  def writeIvfQuantizer(spark: org.apache.spark.sql.SparkSession,
                        path: String,
                        centroids: IndexedSeq[Array[Double]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, j) => (j, c.toSeq) }.toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(path + "/_quantizer")
  }

  /** Rehydrate the [[writeIvfQuantizer]] sidecar into the literal
    * centroid table the probe expressions ride on — the cold-session
    * loader that makes a [[writeIvfTrainedIndex]] store servable
    * without retraining (`ann_ivft_served`). Validates the cell ids
    * are exactly 0..k−1: a damaged sidecar must fail loudly here, not
    * silently mis-probe. k×dim doubles to the driver — the same
    * footprint class as training's own collect. */
  def loadIvfQuantizer(spark: org.apache.spark.sql.SparkSession,
                       path: String): IndexedSeq[Array[Double]] = {
    requireSidecar(spark, path, "_quantizer")
    val rows = spark.read.parquet(path + "/_quantizer")
      .select(col("cell").cast("int"), col("centroid"))
      .orderBy("cell").collect()
    require(rows.nonEmpty, s"empty quantizer sidecar at $path/_quantizer")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i,
        s"quantizer sidecar at $path is not contiguous: " +
          s"expected cell $i, found ${r.getInt(0)}")
    }
    // width check (r14 advice): inconsistent centroid lengths would pass
    // the contiguity check and then silently mis-score probe distances;
    // all k centroids must share one dim (callers verify it equals their
    // own `dim`).
    val dim = rows.head.getSeq[Double](1).length
    require(dim > 0, s"quantizer sidecar at $path has empty centroids")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getSeq[Double](1).length == dim,
        s"quantizer sidecar at $path has inconsistent centroid widths: " +
          s"cell $i is ${r.getSeq[Double](1).length}-dim, expected $dim")
    }
    rows.map(_.getSeq[Double](1).toArray).toIndexedSeq
  }

  /** Cell-assignment frame for APPENDING into an existing
    * [[writeIvfTrainedIndex]] store, bound to the STORE'S OWN quantizer:
    * the centroids come from the target's `_quantizer/` sidecar
    * ([[loadIvfQuantizer]] — loaded once, at frame-construction time),
    * never from the caller, so a misconfigured streamer cannot assign
    * arriving vectors from DIFFERENT centroids than the partitions were
    * written under — that failure writes rows into wrong `cell=`
    * directories with no error and serves them with silent recall loss,
    * which is exactly the failure mode the sidecar exists to kill; the
    * r14 append recipe reintroduced it at the ingest boundary by passing
    * centroids as a parameter. Callers that hold their own copy may pass
    * it via `expected` as a cross-check: any mismatch with the sidecar
    * (count, width, or any component — parquet round-trips doubles
    * bit-exactly, so equality is exact) fails loudly BEFORE any row is
    * assigned.
    *
    * Works on a streaming or batch frame (everything here is map-only:
    * literal-centroid argmin, row-local normalize). The streaming-ingest
    * recipe: build this frame over `readStream`, then
    * `foreachBatch { _.write.mode("append").partitionBy("cell")
    * .parquet(store) }` — byte-identical to the batch write (pinned in
    * StreamingSpec, with the mismatch refusal). */
  def ivfAppendRows(df: DataFrame, idCol: String, vecCol: String,
                    storePath: String, dim: Int,
                    expected: Option[IndexedSeq[Array[Double]]] = None)
      : DataFrame = {
    val stored = boundQuantizer(df, storePath, dim, expected)
    df.filter(size(col(vecCol)) === dim)
      .select(col(idCol).as("neighbor_id"),
        normalize(col(vecCol)).as("cv"),
        element_at(trainedProbeCells(col(vecCol), stored, 1), 1)
          .as("cell"))
  }

  /** [[ivfAppendRows]] for the `IVFx,SQ8` store: the append frame in
    * [[writeIvfSqIndex]]'s exact row shape (neighbor_id, scale, codes,
    * cell), with the cell assignment bound to the TARGET's own
    * `_quantizer/` sidecar — same contract, refusal semantics and
    * streaming recipe as the float-store helper; the int8 encode is the
    * same row-local absmax grid the store was written with, so a
    * streamed append is byte-identical to the batch write. */
  def ivfSqAppendRows(df: DataFrame, idCol: String, vecCol: String,
                      storePath: String, dim: Int,
                      expected: Option[IndexedSeq[Array[Double]]] = None)
      : DataFrame = {
    val stored = boundQuantizer(df, storePath, dim, expected)
    df.filter(size(col(vecCol)) === dim)
      .select(col(idCol).as("neighbor_id"),
        (Quantize.absMax(col(vecCol)) / 127.0).as("scale"),
        Quantize.int8Codes(col(vecCol)).as("codes"),
        element_at(trainedProbeCells(col(vecCol), stored, 1), 1)
          .as("cell"))
  }

  /** The shared sidecar-load-and-cross-check preamble of every
    * `*AppendRows` helper — one copy, so the append-binding discipline
    * (store's own quantizer, loud conflict refusal, dim check) can
    * never diverge across the float/SQ8/PQ stores. */
  private[llm] def boundQuantizer(df: DataFrame, storePath: String,
      dim: Int, expected: Option[IndexedSeq[Array[Double]]])
      : IndexedSeq[Array[Double]] = {
    val stored = loadIvfQuantizer(df.sparkSession, storePath)
    require(stored.head.length == dim,
      s"store at $storePath was written for ${stored.head.length}-dim " +
        s"vectors, not dim=$dim")
    expected.foreach { c =>
      val same = c.length == stored.length &&
        c.zip(stored).forall { case (a, b) =>
          java.util.Arrays.equals(a, b) }
      require(same,
        s"supplied centroids conflict with the quantizer sidecar at " +
          s"$storePath/_quantizer (${c.length} vs ${stored.length} " +
          "cells, or differing components) — appending with them would " +
          "place rows in wrong cell partitions silently; pass " +
          "expected=None to use the store's own quantizer, or rebuild " +
          "the store if retraining was intended")
    }
    stored
  }

  /** [[ivfTrainedTopK]] served from a [[writeIvfTrainedIndex]] store:
    * the probed cells arrive as a LITERAL IN-list → `PartitionFilters`
    * on the scan (pinned in BucketingSpec), IN-list bounded by the
    * CELL DOMAIN (≤ k ints). Row-identical to [[ivfTrainedTopK]] on
    * the same corpus (`ann_ivft_indexed` shares the oracle algebra).
    *
    * EAGER at construction time, like [[hammingTopKIndexed]]: the
    * query cells are localCheckpointed and the probe IN-list collected
    * before this returns. */
  def ivfTrainedTopKIndexed(indexed: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String,
                            centroids: IndexedSeq[Array[Double]], k: Int,
                            probes: Int, dim: Int,
                            roundScore: Int = 6): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(probes >= 1 && probes <= centroids.length,
      s"probes=$probes out of [1, ${centroids.length}]")
    require(centroids.head.length == dim,
      s"centroids are ${centroids.head.length}-dim but the layout says " +
        s"dim=$dim — wrong or damaged _quantizer sidecar?")
    val (q, c) = probedStore(indexed,
      queries.filter(size(col(vecCol)) === dim)
        .select(col(idCol).as("query_id"),
          normalize(col(vecCol)).as("qv"),
          explode(trainedProbeCells(col(vecCol), centroids, probes))
            .as("cell")),
      "cell")
    cellCosineRank(c, q, k, roundScore)
  }

  /** Materialize the IVF,SQ8 layout (FAISS `IVFx,SQ8`): per-vector
    * int8 codes + their dequantization scale written PARTITIONED BY
    * the trained cell — 4× smaller payload than the float store
    * ([[writeIvfTrainedIndex]]) at near-exact recall, the middle point
    * of the serving-regime triad (binary 8 B / PQ m B / SQ8 dim B /
    * float 4·dim B per vector). Same one-map-only-pass write, same
    * `_quantizer/` sidecar, same pruned-probe serving. The
    * quantization grid is [[Quantize.int8Codes]]' per-vector absmax
    * scheme — the `ann_int8_topk` discipline, oracle-replayable. */
  def writeIvfSqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      path: String,
                      centroids: IndexedSeq[Array[Double]],
                      dim: Int): Unit = {
    corpus.filter(size(col(vecCol)) === dim)
      .select(col(idCol).as("neighbor_id"),
        (Quantize.absMax(col(vecCol)) / 127.0).as("scale"),
        Quantize.int8Codes(col(vecCol)).as("codes"),
        element_at(trainedProbeCells(col(vecCol), centroids, 1), 1)
          .as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    // AFTER the store write: overwrite mode clears the root directory.
    // Crash between the two commits leaves a sidecar-less store — an
    // interrupted write, not corruption; see writeIvfQuantizer's
    // crash-window note (loaders fail loudly; re-run the write).
    writeIvfQuantizer(corpus.sparkSession, path, centroids)
  }

  /** The unmaterialized sibling of [[ivfSqTopKIndexed]] (every indexed
    * path here has one — the row-identity reference): cells from the
    * RAW vectors (the store's write-time assignment), scores on the
    * int8 grid via [[Quantize.snap]] on both sides. Queries broadcast
    * (the eval posture). */
  def ivfSqTopK(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String,
                centroids: IndexedSeq[Array[Double]], k: Int,
                probes: Int, dim: Int,
                roundScore: Int = 6): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(probes >= 1 && probes <= centroids.length,
      s"probes=$probes out of [1, ${centroids.length}]")
    val okLen = size(col(vecCol)) === dim
    val q = queries.filter(okLen)
      .select(col(idCol).as("query_id"),
        normalize(Quantize.snap(col(vecCol))).as("qv"),
        explode(trainedProbeCells(col(vecCol), centroids, probes))
          .as("cell"))
    val c = corpus.filter(okLen)
      .select(col(idCol).as("neighbor_id"),
        normalize(Quantize.snap(col(vecCol))).as("cv"),
        element_at(trainedProbeCells(col(vecCol), centroids, 1), 1)
          .as("cell"))
    cellCosineRank(c, broadcast(q), k, roundScore)
  }

  /** Serve a [[writeIvfSqIndex]] store: probed cells arrive as the
    * usual domain-bounded literal IN-list → `PartitionFilters`, the
    * candidate side dequantizes its stored codes
    * ([[Quantize.dequantize]] — `codes[i]·scale`, exact double ops on
    * stored values), the query side snaps through the SAME int8 grid
    * ([[Quantize.snap]], bit-identical to encode→decode by property
    * pin), and cosine ranks within — so both sides score on the grid,
    * the `ann_int8_topk` discipline under cell pruning. Row-identical
    * to a full int8 scan restricted to the probed cells (the oracle
    * replays grid, cells and ranking). EAGER at construction like the
    * other `*TopKIndexed` paths. */
  def ivfSqTopKIndexed(indexed: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String,
                       centroids: IndexedSeq[Array[Double]], k: Int,
                       probes: Int, dim: Int,
                       roundScore: Int = 6): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(probes >= 1 && probes <= centroids.length,
      s"probes=$probes out of [1, ${centroids.length}]")
    require(centroids.head.length == dim,
      s"centroids are ${centroids.head.length}-dim but the layout says " +
        s"dim=$dim — wrong or damaged _quantizer sidecar?")
    val (q, c0) = probedStore(indexed,
      queries.filter(size(col(vecCol)) === dim)
        .select(col(idCol).as("query_id"),
          normalize(Quantize.snap(col(vecCol))).as("qv"),
          explode(trainedProbeCells(col(vecCol), centroids, probes))
            .as("cell")),
      "cell")
    val c = c0.select(col("neighbor_id"),
      normalize(Quantize.dequantize(col("codes"), col("scale")))
        .as("cv"),
      col("cell"))
    cellCosineRank(c, q, k, roundScore)
  }

  /** Loud, diagnosable failure when a store is missing its sidecar —
    * shared by every sidecar loader. A data-complete store with no
    * sidecar means the write was interrupted between the data commit
    * and the sidecar commit (see [[writeIvfQuantizer]]'s crash-window
    * note), and the error should say so instead of a bare
    * path-does-not-exist. */
  private[llm] def requireSidecar(spark: org.apache.spark.sql.SparkSession,
                                  path: String, name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw new IllegalStateException(
      s"store at $path has no $name/ sidecar — if the data partitions " +
        "are present, the store write was interrupted between the data " +
        "commit and the sidecar commit (data is written first); re-run " +
        "the store write, or re-write just the sidecar if the trained " +
        "quantizer is still in hand")
  }

  /** Shared probe preamble for EVERY `*TopKIndexed` serving path
    * (hamming, axis-IVF, trained-IVF, SQ8, and [[Pq.ivfPqTopKIndexed]]
    * — one copy, so the paths can never diverge on the probe-collect
    * discipline): localCheckpoint the exploded query frame (it is
    * consumed twice — the IN-list collect and the join), collect the
    * DISTINCT probe keys (bounded by the key DOMAIN — bucket/cell
    * counts, never the batch or corpus size), and restrict the store by
    * the typed literal IN-list so the probed keys become
    * `PartitionFilters` on the scan. Returns (checkpointed queries,
    * pruned store). Eager by design — the callers' documented
    * construction-time contract. */
  private[llm] def probedStore(indexed: DataFrame, q: DataFrame,
                               keyCol: String): (DataFrame, DataFrame) = {
    val qc = q.localCheckpoint()
    val probed = qc.select(keyCol).distinct().collect()
      .map(_.get(0) match {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.toLong
        // before the catch-all: `other.getClass` on a null key (e.g. a
        // null vector element propagating through the cell expression)
        // would NPE and mask the diagnostic (r14 advice)
        case null => throw new IllegalArgumentException(
          s"null probe key in $keyCol — a query row produced no " +
            "bucket/cell (null vector element upstream?)")
        case other => throw new IllegalArgumentException(
          s"probe key $other (${other.getClass.getSimpleName}) is not integral")
      }).sorted.toSeq
    (qc, indexed.filter(col(keyCol).isin(
      typedKeys(probed, indexed.schema(keyCol).dataType): _*)))
  }

  /** Coerce probe-key literals to the store column's ACTUAL dtype.
    * Partition-column type inference hands the written LONG/INT back as
    * whatever it infers (and a catalog-registered store may carry a
    * STRING partition column, or inference may be disabled entirely) —
    * an IN-list of mismatched literals would wrap the partition COLUMN
    * in a cast, which under those configs stops unwrapping into
    * `PartitionFilters` and silently voids the pruned-read contract.
    * Matching the literal type keeps pruning config-independent. */
  private def typedKeys(values: Seq[Long],
                        dt: org.apache.spark.sql.types.DataType)
      : Seq[Any] = dt match {
    case org.apache.spark.sql.types.LongType => values
    case org.apache.spark.sql.types.IntegerType => values.map(_.toInt)
    case org.apache.spark.sql.types.ShortType => values.map(_.toShort)
    case org.apache.spark.sql.types.StringType => values.map(_.toString)
    case _ => values
  }

  /** Recall@k of an approximate ANN result against the exact baseline:
    * per query, the fraction of the exact top-k the approximate result
    * also returned. Both inputs are (query_id, rank, neighbor_id, …)
    * frames as produced by the topK operators. Output: (query_id,
    * n_hits, recall).
    *
    * This is the measurement that sizes the LSH knobs (b, bands, probes)
    * for a corpus: run it on a query sample, then trade recall against
    * bucket occupancy. Scale shape: both inputs are |Q|×k rows — the join
    * and aggregate are negligible next to the topK computations that feed
    * them, and the exact side only needs a SAMPLE of queries (recall is
    * estimated, the sample mean). */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    // truncate BOTH sides to rank <= k (the topK output contract carries
    // `rank`): a caller passing frames computed at a larger k would
    // otherwise silently inflate n_hits/recall past the k being measured
    val e = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    // defensive dedup (cheap on |Q|×k rows): duplicate approx rows would
    // inflate n_hits through join multiplication
    val a = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("__hit", lit(1L))
    // denominator = the ACTUAL exact-result size per query, not k: a
    // query with fewer than k true neighbors (tiny corpus, filters)
    // must be able to score recall 1.0
    e.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hits"),
        count(lit(1)).as("__n_exact"))
      .withColumn("recall",
        round(col("n_hits") / col("__n_exact").cast("double"), 6))
      .drop("__n_exact")
  }

  /** nDCG discount weights 1/log₂(r+1) for ranks 1..k, FIXED to 9 decimal
    * places. The point of pinning them as decimals: `log2` is a libm call
    * whose last ulp differs across engines, so the metric computes DCG as
    * an exact DECIMAL sum of these shared literals instead — any engine
    * (or the DuckDB oracle) reproduces the sums bit-for-bit by using the
    * same constant table. */
  def ndcgWeights(k: Int): IndexedSeq[java.math.BigDecimal] =
    (1 to k).map { r =>
      new java.math.BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
        .setScale(9, java.math.RoundingMode.HALF_UP)
    }

  /** Prefix sums of [[ndcgWeights]] — ideal DCG for a query with r
    * relevant items (r ≤ k), exact decimal arithmetic. */
  def ndcgCumWeights(k: Int): IndexedSeq[java.math.BigDecimal] =
    ndcgWeights(k).scanLeft(java.math.BigDecimal.ZERO)(_.add(_)).tail

  /** Graded ranking metrics of a retrieval result against a binary
    * relevance set: per query, nDCG@k and MRR@k — the measurements that
    * complement [[recallAtK]] when ORDER inside the top-k matters (recall
    * treats rank 1 and rank k the same; a retrieval leg that buries its
    * hits still scores full recall).
    *
    * `ranked` is a (query_id, rank, neighbor_id, …) frame as produced by
    * the topK operators; `relevant` is (query_id, neighbor_id) ground
    * truth (judged pairs, same-label pairs, click data). Output per
    * RANKED query: (query_id, n_rel, mrr, dcg, ndcg) — n_rel is the full
    * relevant count (may exceed k; it caps the ideal DCG at k), mrr is
    * 1/rank of the first relevant hit (0 if none in the top-k), ndcg is
    * DCG/IDCG in [0, 1] (0 when the query has no relevant items at all).
    *
    * Determinism: DCG is an exact DECIMAL(28,9) sum of the shared
    * [[ndcgWeights]] literals (order-free); mrr terms are single
    * correctly-rounded divisions; only the final dcg/idcg division and
    * 6-dp rounds touch doubles. Scale shape: inputs are |Q|×k ranked rows
    * joined against the relevance pairs on their composite key, then one
    * map-side-combined aggregate per query — an eval op over a query
    * sample, negligible next to the retrieval runs that feed it. */
  def rankMetrics(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k=$k not in 1..1000")
    val ws = ndcgWeights(k)
    val cum = ndcgCumWeights(k)
    def dec(b: java.math.BigDecimal): Column =
      lit(b).cast("decimal(28,9)")
    val wArr = array(ws.map(dec): _*)
    val cumArr = array(cum.map(dec): _*)
    val r = ranked.filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"))
    // defensive dedup (cheap on judged pairs): duplicate relevance rows
    // would multiply ranked rows through the join and inflate DCG
    val rel = relevant.select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val flagged = r.join(rel.withColumn("__rel", lit(1)),
      Seq("query_id", "neighbor_id"), "left")
    val per = flagged.groupBy("query_id").agg(
      sum(when(col("__rel").isNotNull, element_at(wArr, col("rank")))
        .otherwise(dec(java.math.BigDecimal.ZERO))).as("__dcg"),
      max(when(col("__rel").isNotNull,
        round(lit(1.0) / col("rank").cast("double"), 9))).as("__rr"))
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    per.join(nRel, Seq("query_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .select(col("query_id"), col("n_rel"),
        coalesce(col("__rr"), lit(0.0)).as("mrr"),
        round(col("__dcg").cast("double"), 6).as("dcg"),
        when(col("n_rel") === 0L, lit(0.0)).otherwise(
          round(col("__dcg").cast("double") /
            element_at(cumArr, least(col("n_rel"), lit(k.toLong))
              .cast("int")).cast("double"), 6)).as("ndcg"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, LSH-blocked:
    * only same-bucket pairs are scored (id_a < id_b). `rotatedDim` selects
    * the bucket family exactly as in [[signLshTopK]].
    *
    * `bands` is the scale knob (OR-amplification): band j hashes with an
    * independent seeded plane family, and a pair is a candidate if it
    * collides in ANY band. The sf1 rehearsal (SCALE.md §10a) measured why
    * this matters: bucket bits b must grow ~log₂(N) to keep per-bucket
    * occupancy — and therefore pair cost — constant, but raising b alone
    * drops recall (a near-dup pair straddles a hyperplane with
    * probability ∝ b·θ/π). Multiple independent bands restore it:
    * P[candidate] = 1 − (1 − p^b)^bands. b=8, bands=4 is a reasonable
    * 100 TB start; bands=1 (default) reproduces the single-family
    * behavior. Cost is `bands` map-side bucket columns and a
    * candidate-pair dedup before scoring — never an extra corpus scan. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, b: Int,
                         rotatedDim: Option[Int] = None,
                         seed: Long = DefaultSeed,
                         roundScore: Int = 6,
                         bands: Int = 1): DataFrame = {
    require(bands >= 1, s"bands=$bands must be >= 1")
    require(bands == 1 || rotatedDim.isDefined,
      "multi-band blocking needs the seeded rotated family (rotatedDim)")
    // Canonicalize on the RAW vector first (the simhashPairs trick,
    // SCALE.md §10a): a d-duplicated vector costs one row in the bucket
    // join instead of d², and the win grows as (N/D)² with duplication —
    // exact duplicates are the norm in crawled embedding corpora. The
    // ids array is bounded by per-vector duplication (same state bound
    // argument as the winnow fp groups). Dup-free corpora pay one extra
    // corpus exchange (the canonicalization aggregate) and nothing else.
    val ok = df.filter(size(col(vecCol)) >= rotatedDim.getOrElse(b))
    val groups = ok.groupBy(col(vecCol).as("__v"))
      .agg(sort_array(collect_list(col(idCol))).as("__ids"))
      .select(col("__v"), col("__ids"),
        element_at(col("__ids"), 1).as("__rep"),
        normalize(col("__v")).as("nv"))
    // [within-group] identical vectors share every bucket, so the original
    // bucket join emits all their a<b pairs iff the self-score clears the
    // threshold — reproduce that gate exactly (dot of the normalized
    // vector with itself, rounded, NOT an assumed 1.0)
    // two chained explodes keep per-row arrays O(d) — the d²/2 pair
    // volume is inherent output, but a single in-row array of it is not
    // survivable for heavily duplicated vectors
    val within = groups.filter(size(col("__ids")) >= 2)
      .withColumn("score", round(dot(col("nv"), col("nv")), roundScore))
      .filter(col("score") >= threshold)
      .select(col("__ids"), col("score"),
        posexplode(col("__ids")).as(Seq("__i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("__ids"), col("__i") + lit(2),
          greatest(size(col("__ids")) - col("__i") - 1, lit(0))))
          .as("id_b"),
        col("score"))
      .select(col("id_a"), col("id_b"), col("score"))
    // [cross-group] band/bucket the DISTINCT vectors only
    val bandCols = (0 until bands).map { j =>
      val bucket = rotatedDim match {
        case Some(dim) => signBucketRotated(col("__v"), b, dim, seed + j)
        case None      => signBucket(col("__v"), b)
      }
      struct(lit(j).as("band"), bucket.as("bucket"))
    }
    val withBucket = groups
      .select(col("__rep"), col("__ids"), col("nv"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("__rep"), col("__ids"), col("nv"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = withBucket.select(col("band"), col("bucket"),
      col("__rep").as("__rep_a"), col("__ids").as("__ids_a"),
      col("nv").as("va"))
    val bb = withBucket.select(col("band"), col("bucket"),
      col("__rep").as("__rep_b"), col("__ids").as("__ids_b"),
      col("nv").as("vb"))
    // Score and threshold INSIDE the bucket join, BEFORE any pair dedup:
    // a vector pair colliding in several bands recomputes its
    // (deterministic) dot once per band, but only the above-threshold
    // survivors — thin rows — ever reach a dedup exchange. Deduping first
    // would shuffle every candidate pair with both dim-wide vectors
    // attached (the sf1 rehearsal measured that plan at 211 s vs ~bands×
    // dot cost here).
    val scoredGroups = a.join(bb, Seq("band", "bucket"))
      .filter(col("__rep_a") < col("__rep_b"))
      .withColumn("score", round(dot(col("va"), col("vb")), roundScore))
      .filter(col("score") >= threshold)
      .select(col("__rep_a"), col("__rep_b"), col("__ids_a"),
        col("__ids_b"), col("score"))
    val distinctGroups =
      if (bands == 1) scoredGroups
      else scoredGroups.dropDuplicates("__rep_a", "__rep_b")
    // expand group pairs to id pairs map-side; distinct groups are
    // disjoint id sets, so every (a, b) orders via least/greatest
    val cross = distinctGroups
      .select(col("__ids_b"), col("score"),
        explode(col("__ids_a")).as("__a"))
      .select(col("__a"), col("score"), explode(col("__ids_b")).as("__b"))
      .select(least(col("__a"), col("__b")).as("id_a"),
        greatest(col("__a"), col("__b")).as("id_b"), col("score"))
    within.unionByName(cross)
  }

  /** k-nearest-neighbor GRAPH over a corpus — every node's top-k cosine
    * neighbors among its LSH candidates. The all-nodes-are-queries sibling
    * of [[signLshTopK]], with the plan shape that difference forces:
    * [[signLshTopK]] broadcasts its (small) query set, but a corpus can't
    * broadcast against itself, so here both sides of the candidate join
    * are the SAME bucketed frame and the join is a plain shuffle hash
    * join on (band, bucket) — the corpus shuffles once per side, never
    * all-pairs. The kNN graph is the substrate for graph-based curation
    * (SemDeDup-style pruning, label propagation, connected-component
    * clustering via [[Dedup.clusters]] over the edge set).
    *
    * `bands` independent seeded plane families OR-amplify recall exactly
    * as in [[cosineNearDupPairs]]; a pair colliding in several bands is
    * deduplicated before ranking. Bucket bits `b` grow ~log₂(N) to hold
    * per-bucket occupancy (and so per-node candidate count) constant —
    * the same sizing rule as the near-dup family, measured in SCALE.md
    * §10a. Top-k per node is a bounded window over candidates, ties
    * broken by neighbor id.
    *
    * Output: (src, rank, dst, score) — directed edges (kNN is not
    * symmetric); [[mutualKnnEdges]] derives the undirected mutual graph.
    *
    * Nodes in singleton buckets across all bands emit NO edges (correct
    * for an approximate graph: no candidates ⇒ no neighbors) — count
    * them against the corpus size when sizing b/bands. */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               b: Int, dim: Int, seed: Long = DefaultSeed,
               bands: Int = 1, roundScore: Int = 6): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(bands >= 1, s"bands=$bands must be >= 1")
    // too-short vectors degrade OUT of the graph (same posture as
    // signLshTopK/ivfTopK) rather than killing the job under ANSI mode
    val ok = corpus.filter(size(col(vecCol)) >= dim)
    // bucket on the RAW vector (sign is scale-invariant, and the raw
    // dot avoids any ulp-level sign flip vs the normalized one); score
    // on the normalized vector so pair scoring is one dot product
    val bandCols = (0 until bands).map { j =>
      struct(lit(j).as("band"),
        signBucketRotated(col(vecCol), b, dim, seed + j).as("bucket"))
    }
    val nodes = ok.select(col(idCol).as("id"),
        normalize(col(vecCol)).as("nv"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("nv"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val lhs = nodes.select(col("band"), col("bucket"),
      col("id").as("src"), col("nv").as("va"))
    val rhs = nodes.select(col("band"), col("bucket"),
      col("id").as("dst"), col("nv").as("vb"))
    // score INSIDE the bucket join (deterministic, so the cross-band
    // dedup can key on the thin (src, dst) rows — the vectors never
    // reach the dedup exchange; the cosineNearDupPairs lesson)
    val scored = lhs.join(rhs, Seq("band", "bucket"))
      .filter(col("src") =!= col("dst"))
      .withColumn("score", dot(col("va"), col("vb")))
      .select(col("src"), col("dst"), col("score"))
    val cand = if (bands == 1) scored
               else scored.dropDuplicates("src", "dst")
    val w = Window.partitionBy(col("src"))
      .orderBy(col("score").desc, col("dst"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("rank").cast("long").as("rank"), col("dst"),
        round(col("score"), roundScore).as("score"))
  }

  /** Mutual-kNN edges from a [[knnGraph]] result: the undirected pairs
    * where EACH endpoint ranks the other in its own top-k. Mutuality is
    * the standard sparsifier before graph clustering — a hub node's
    * one-way edges (everyone's neighbor, nobody's mutual) drop out, which
    * is exactly what keeps a [[Dedup.clusters]] pass over the edge set
    * from collapsing the corpus into one giant component.
    *
    * Input is an edge frame (src, dst, score, …); output (id_a, id_b,
    * score) with id_a < id_b, one row per mutual pair (cosine is
    * symmetric, so either direction's score is THE score). Scale shape:
    * |V|·k rows self-joined on their (src, dst) key — negligible next to
    * the graph build. */
  def mutualKnnEdges(edges: DataFrame): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"), col("score"))
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    fwd.join(rev, Seq("src", "dst"), "left_semi")
      .filter(col("src") < col("dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"), col("score"))
  }

  // -------------------------------------------- hybrid retrieval fusion

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    * retrieval lists — the standard way to combine a sparse (BM25) and a
    * dense (embedding ANN) leg without calibrating their incomparable
    * scores: each list contributes `1/(k0 + rank)` for the items it
    * ranked, fused items sort by the sum. `k0 = 60` is the paper's
    * constant; larger values flatten the head.
    *
    * `lists` maps a leg name to a frame holding (`idCol`, `rankCol`) with
    * rank 1-based; the output carries one nullable `<name>_rank` column
    * per leg (null ⟺ that leg didn't rank the item), plus `rrf` and the
    * fused top-`k` cut (ties broken by id — deterministic). The reciprocal
    * terms are added in `lists` order: each term is one correctly-rounded
    * division and the left-to-right double sum is fixed by that order, so
    * the fused scores are engine-portable (the oracle adds in the same
    * order).
    *
    * Scale shape: inputs are top-k lists — thousands of rows at most, by
    * construction — so the outer-join chain stays broadcast-sized no
    * matter the corpus behind the legs; all the heavy lifting (corpus
    * scans, ANN buckets) happened inside the legs. The final order is a
    * TakeOrderedAndProject, not a total sort. */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
              rankCol: String, k0: Int, k: Int): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 > 0 && k > 0, s"k0=$k0 and k=$k must be positive")
    val named = lists.map { case (name, df) =>
      name -> df.select(col(idCol), col(rankCol).cast("long")
        .as(s"${name}_rank"))
    }
    val joined = named.map(_._2).reduce { (a, b) =>
      a.join(b, Seq(idCol), "full_outer")
    }
    val terms = named.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k0.toLong) + col(s"${name}_rank")), lit(0.0))
    }
    joined
      .withColumn("rrf", round(terms.reduce(_ + _), 9))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** Greedy best-first GRAPH search over a prebuilt kNN graph — the
    * serving-side navigation layer of graph-based ANN (the HNSW family's
    * base-layer walk, batched): every query starts at the shared entry
    * node (lowest id), and each hop expands the current top-`beam`
    * nodes' out-edges, scores the UNVISITED candidates against the
    * query, and re-ranks. After `hops` rounds the best `k` visited nodes
    * are the result. The quality/fanout trade is explicit: recall grows
    * with beam × hops; edges come from [[knnGraph]], whose bucket sizing
    * governs graph connectivity.
    *
    * Determinism: scores are the shared sequential-fold dot on
    * normalized vectors (bit-identical in the oracle), every ranking
    * breaks ties on the node id, and the visited-set dedup is exact —
    * the whole traversal unrolls hop-for-hop in SQL.
    *
    * Scale shape per hop: the frontier frame is |Q|×beam rows; expansion
    * is an equi-join onto the edge frame (hash-partitioned on src), the
    * anti-join against visited is |Q|×|visited-per-query| (bounded by
    * beam×hops×out-degree), and scoring joins candidates to the vector
    * table by id — at 100 TB that lookup is the one random-access-shaped
    * join (a production deployment backs it with a KV/ANN-serving store;
    * the plan keeps it an id-keyed hash join). `localCheckpoint` per hop
    * caps plan depth. Nothing but the entry id (one scalar) touches the
    * driver. */
  def graphSearchTopK(corpus: DataFrame, idCol: String, vecCol: String,
                      queries: DataFrame, edges: DataFrame, k: Int,
                      beam: Int, hops: Int, dim: Int): DataFrame = {
    require(k >= 1 && beam >= 1 && hops >= 1 && hops <= 10,
      s"k=$k beam=$beam hops=$hops out of range")
    val q = queries.filter(size(col(vecCol)) >= dim)
      .select(col(idCol).as("query_id"), normalize(col(vecCol)).as("__qv"))
    val entryRow = corpus.filter(size(col(vecCol)) >= dim)
      .agg(min(col(idCol))).head
    if (entryRow.isNullAt(0))
      // empty (or all-degenerate) corpus: no entry point, no results —
      // an empty frame with the contract schema, not a crash
      return q.select(col("query_id"), lit(0L).as("rank"),
        col("query_id").as("neighbor_id"), lit(0.0).as("score")).limit(0)
    val entry = entryRow.getLong(0)
    graphWalk(corpus, idCol, vecCol, q, edges,
      q.select(col("query_id"), lit(entry).as("id")), k, beam, hops, dim)
  }

  /** [[graphSearchTopK]] with PER-QUERY entry points seeded from the IVF
    * coarse quantizer ([[axisCells]] over the first `m` components): each
    * query starts at the LOWEST-ID corpus vector of its own winner cell
    * instead of the one global entry — the walk begins inside the query's
    * coarse neighborhood, so the same beam × hops budget spends its
    * expansion where the true neighbors live (the HNSW-family practice of
    * seeding the base-layer walk from an upper coarse layer). A query
    * whose cell holds no corpus vector falls back to the global
    * lowest-id entry.
    *
    * Cost over the unseeded walk: one ≤ 2m-row cell-representative
    * aggregate, broadcast into a map-side seed join — nothing else
    * changes; determinism and the hop-unrolled oracle replay carry over
    * (the cell derivation is the [[ivfTopK]] expression, already
    * oracle-pinned). */
  def graphSearchTopKSeeded(corpus: DataFrame, idCol: String,
                            vecCol: String, queries: DataFrame,
                            edges: DataFrame, k: Int, beam: Int,
                            hops: Int, dim: Int, m: Int = 4): DataFrame = {
    require(k >= 1 && beam >= 1 && hops >= 1 && hops <= 10,
      s"k=$k beam=$beam hops=$hops out of range")
    require(m >= 2 && m <= dim, s"m=$m out of [2,$dim]")
    val q = queries.filter(size(col(vecCol)) >= dim)
      .select(col(idCol).as("query_id"), normalize(col(vecCol)).as("__qv"))
    val entryRow = corpus.filter(size(col(vecCol)) >= dim)
      .agg(min(col(idCol))).head
    if (entryRow.isNullAt(0))
      return q.select(col("query_id"), lit(0L).as("rank"),
        col("query_id").as("neighbor_id"), lit(0.0).as("score")).limit(0)
    val entry = entryRow.getLong(0)
    val (cw, _) = axisCells(col(vecCol), m)
    val reps = corpus.filter(size(col(vecCol)) >= dim)
      .select(cw.as("cell"), col(idCol).as("__rid"))
      .groupBy("cell").agg(min(col("__rid")).as("__eid"))
    val seeds = queries.filter(size(col(vecCol)) >= dim)
      .select(col(idCol).as("query_id"), cw.as("cell"))
      .join(broadcast(reps), Seq("cell"), "left")
      .select(col("query_id"), coalesce(col("__eid"), lit(entry)).as("id"))
    graphWalk(corpus, idCol, vecCol, q, edges, seeds, k, beam, hops, dim)
  }

  /** The shared batched greedy walk: seed each query's visited set from
    * `seeds` (query_id, id), then `hops` rounds of expand-score-rerank.
    * See [[graphSearchTopK]] for the determinism and scale arguments. */
  private def graphWalk(corpus: DataFrame, idCol: String, vecCol: String,
                        q: DataFrame, edges: DataFrame, seeds: DataFrame,
                        k: Int, beam: Int, hops: Int,
                        dim: Int): DataFrame = {
    val nv = corpus.filter(size(col(vecCol)) >= dim)
      .select(col(idCol).as("__nid"), normalize(col(vecCol)).as("__nv"))
    // materialize the edge frame ONCE: its lineage (the kNN build's LSH
    // join + ranking window) would otherwise re-execute inside EVERY
    // hop's expansion join (the pagerank lesson)
    val e = edges.select(col("src").as("__esrc"), col("dst").as("__edst"))
      .localCheckpoint()
    def score(cand: DataFrame): DataFrame = cand
      .join(nv, cand("id") === nv("__nid"))
      .join(q, Seq("query_id"))
      .select(col("query_id"), col("id"),
        dot(col("__nv"), col("__qv")).as("score"))
    var visited = score(seeds).localCheckpoint()
    var frontier = visited.select(col("query_id"), col("id"))
    for (_ <- 1 to hops) {
      val cand = frontier.join(e, frontier("id") === e("__esrc"))
        .select(col("query_id"), col("__edst").as("id")).distinct()
        .join(visited.select(col("query_id"), col("id")),
          Seq("query_id", "id"), "left_anti")
      visited = visited.unionByName(score(cand)).localCheckpoint()
      frontier = visited
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("id"))))
        .filter(col("__r") <= beam)
        .select(col("query_id"), col("id"))
    }
    visited.filter(col("id") =!= col("query_id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        round(col("score"), 6).as("score"))
  }
}
