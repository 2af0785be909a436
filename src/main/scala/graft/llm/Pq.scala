package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables.spread

/** Product quantization for embedding compression and memory-bound ANN
  * (Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): split each D-dim vector into `m` subspaces of
  * `D/m` dims, quantize each subspace independently against a `k`-word
  * codebook, and store only the `m` code bytes — a D·4-byte float vector
  * compresses to `m` bytes (32× here: 64 floats → 8 codes), which is what
  * lets a billion-vector index live in RAM.
  *
  * Codebooks here are DETERMINISTIC seeded dyadic vectors (the
  * [[Similarity.rotationPlanes]] generator, reshaped m×k) — the same
  * stand-in discipline as [[QualityModel]]'s pseudo-weights: the operator,
  * its plan shape, and its cross-engine determinism are all real and
  * oracle-checkable without a training artifact, and k-means-trained
  * codebooks (see [[Clustering]]) plug in by swapping the literal. Every
  * codebook entry is a plan literal, so encode is a map-only scan: `m·k`
  * fixed-order dot products per vector and an `array_sort` argmin per
  * subspace — no shuffle, no join, no UDF.
  *
  * Engine portability: subspace scores use the k-means comparison idiom
  * `dot(c,c) − 2·dot(sub,c)` (the ‖sub‖² term is constant per subspace
  * and cannot change the argmin); both dots are the shared sequential
  * left-fold on exactly-representable inputs (float→double widening +
  * dyadic literals), so the chosen code — and hence everything downstream
  * — is bit-identical in any IEEE engine. Ties break toward the lower
  * code index in both engines.
  */
object Pq {

  /** Deterministic m×k codebooks of `subDim`-dim dyadic vectors in
    * [−1, 1) — [[Similarity.rotationPlanes]] reshaped, so the generator
    * stays single-sourced. Codebook j serves dims [j·subDim, (j+1)·subDim). */
  def codebooks(m: Int, k: Int, subDim: Int,
                seed: Long = Similarity.DefaultSeed): IndexedSeq[IndexedSeq[Array[Double]]] =
    Similarity.rotationPlanes(m * k, subDim, seed)
      .grouped(k).toIndexedSeq

  /** Per-subspace code assignment for one vector column: `codes[j]` is the
    * argmin-distance codeword of subspace j, an int in [0, k). Map-only;
    * vectors shorter than m·subDim are dropped (no partial encode). */
  private def codesCol(vec: Column, m: Int, k: Int, subDim: Int,
                       cbs: IndexedSeq[IndexedSeq[Array[Double]]]): Column = {
    val perSub = (0 until m).map { j =>
      val sub = slice(vec, j * subDim + 1, subDim)
      val scored = (0 until k).map { c =>
        val cb = cbs(j)(c)
        // dot(c,c) folded in Scala would bake a computed double into the
        // plan — fine, but the oracle must inline the SAME literal; both
        // sides instead recompute nothing: the literal is stringified
        // once here and pasted into the SQL by the query module.
        val l = Pq.selfDot(cb)
        val s = lit(l) - lit(2.0) * Similarity.dot(sub, typedlit(cb.toSeq))
        struct(s.as("s"), lit(c).as("c"))
      }
      array_sort(array(scored: _*)).getItem(0).getField("c")
    }
    array(perSub: _*)
  }

  /** ‖v‖² as the exact sequential left-fold both engines' dot uses. */
  private[graft] def selfDot(v: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i) * v(i); i += 1 }
    acc
  }

  /** (id, codes: array<int> of length m) — the compressed index. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             m: Int, k: Int, subDim: Int,
             seed: Long = Similarity.DefaultSeed): DataFrame =
    encodeWith(df, idCol, vecCol, subDim, codebooks(m, k, subDim, seed))

  /** [[encode]] against explicit codebooks (trained or seeded). */
  def encodeWith(df: DataFrame, idCol: String, vecCol: String, subDim: Int,
                 cbs: IndexedSeq[IndexedSeq[Array[Double]]]): DataFrame = {
    val m = cbs.length
    val k = cbs.head.length
    require(m > 0 && k > 1 && subDim > 0, s"m=$m k=$k subDim=$subDim")
    spread(df).filter(size(col(vecCol)) >= m * subDim)
      .select(col(idCol),
        codesCol(col(vecCol), m, k, subDim, cbs).as("codes"))
  }

  /** Per-subspace Lloyd-trained codebooks — the REAL quantizer (the
    * seeded default is deliberate plumbing; on the fixture corpus one
    * training round lifts ADC recall@3 ~8×). Deterministic and
    * engine-reproducible by the [[Clustering]] discipline: subvectors
    * snap to the dyadic 2⁻²⁰ grid (so component sums are EXACT and
    * aggregation order is irrelevant), init is the k lowest-id vectors'
    * subvectors, assignment scores are the shared sequential-fold dots
    * against plan-literal centroids, and each new centroid is one
    * correctly-rounded division of an exact sum. Train on the SAME
    * quantized vectors you encode ([[Clustering.quantize]]), and an
    * oracle replaying the identical derivation matches bit-for-bit.
    *
    * Scale shape: ONE distributed pass per iteration covering ALL
    * subspaces (rows explode to (subspace, subvector) map-side; the
    * update is a map-side-combined (subspace, cluster, dim) sum);
    * m·k·subDim values return to the driver per iteration — the same
    * driver-state class as [[Clustering.kmeansScored]], independent of
    * corpus size. */
  def trainCodebooks(df: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, subDim: Int,
                     iters: Int = 1): IndexedSeq[IndexedSeq[Array[Double]]] = {
    require(m > 0 && k > 1 && subDim > 0 && iters >= 0,
      s"m=$m k=$k subDim=$subDim iters=$iters")
    val base = spread(df).filter(size(col(vecCol)) >= m * subDim)
      .select(col(idCol).as("__id"),
        Clustering.quantize(col(vecCol)).as("__w"))
    val subs = base.select(col("__id"), posexplode(array((0 until m).map(
        j => slice(col("__w"), j * subDim + 1, subDim)): _*)))
      .select(col("__id"), col("pos").as("__j"), col("col").as("__sub"))
    // init: the k lowest-id vectors' subvectors, per subspace
    var cbs: IndexedSeq[IndexedSeq[Array[Double]]] = {
      val first = base.orderBy(col("__id")).limit(k).collect()
        .map(_.getSeq[Double](1).toArray)
      (0 until m).map(j => first.toIndexedSeq.map(
        _.slice(j * subDim, (j + 1) * subDim)))
    }
    for (_ <- 0 until iters) {
      // assignment against the current plan-literal centroids — one
      // scores array per (row, subspace), argmin with low-code ties
      val assign = (0 until m).foldLeft(lit(-1)) { (acc, j) =>
        val scored = (0 until k).map { c =>
          val cb = cbs(j)(c)
          struct((lit(selfDot(cb)) -
            lit(2.0) * Similarity.dot(col("__sub"), typedlit(cb.toSeq)))
            .as("s"), lit(c).as("c"))
        }
        when(col("__j") === j,
          array_sort(array(scored: _*)).getItem(0).getField("c"))
          .otherwise(acc)
      }
      val sums = subs.withColumn("__c", assign)
        .select(col("__j"), col("__c"), posexplode(col("__sub")))
        .groupBy(col("__j"), col("__c"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byJc = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      cbs = cbs.zipWithIndex.map { case (book, j) =>
        book.zipWithIndex.map { case (prev, c) =>
          byJc.get((j, c)) match {
            case Some(rows) =>
              val arr = new Array[Double](subDim)
              rows.foreach(r =>
                arr(r.getInt(2)) = r.getDouble(3) / r.getLong(4))
              arr
            case None => prev // empty cluster keeps its centroid
          }
        }
      }
    }
    cbs
  }

  /** Asymmetric-distance (ADC) top-`topK` search: each query's exact
    * subvectors score against the corpus' RECONSTRUCTED vectors
    * (codeword concatenation), ranked by squared L2 distance. The
    * per-query constant ‖q‖² is dropped (it cannot reorder one query's
    * ranking), leaving `dot(recon,recon) − 2·dot(q,recon)` — two
    * sequential-fold dots on literal-derived doubles, bit-identical in
    * any IEEE engine; ties break on neighbor id.
    *
    * Scale shape: the corpus side is a map-only encode+reconstruct scan
    * (no shuffle); queries broadcast and the per-query top-k is a rank
    * window over the blocked pairs — the [[Similarity.bruteForceTopK]]
    * posture. At 100 TB the production composition is IVF-then-PQ
    * ([[Similarity.ivfTopK]]'s coarse quantizer bucketing this scan down
    * to `probes/m` of the corpus); the ADC kernel is unchanged there. */
  /** Codeword reconstruction of an encoded vector — the m·subDim array
    * ADC scores against. Literal-derived doubles throughout. */
  private def reconCol(codes: Column, m: Int,
                       cbs: IndexedSeq[IndexedSeq[Array[Double]]]): Column =
    flatten(array((0 until m).map { j =>
      element_at(typedlit(cbs(j).map(_.toSeq)), element_at(codes, j + 1) + 1)
    }: _*))

  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, topK: Int, m: Int, k: Int, subDim: Int,
              seed: Long = Similarity.DefaultSeed): DataFrame =
    adcTopKWith(corpus, queries, idCol, vecCol, topK, subDim,
      codebooks(m, k, subDim, seed))

  /** [[adcTopK]] against explicit codebooks (trained or seeded). */
  def adcTopKWith(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, topK: Int, subDim: Int,
                  cbs: IndexedSeq[IndexedSeq[Array[Double]]]): DataFrame = {
    require(topK > 0, s"topK=$topK")
    val m = cbs.length
    val k = cbs.head.length
    val codes = codesCol(col(vecCol), m, k, subDim, cbs)
    val recon = reconCol(codes, m, cbs)
    val enc = spread(corpus).filter(size(col(vecCol)) >= m * subDim)
      .select(col(idCol).as("neighbor_id"), recon.as("__recon"))
    val q = queries.filter(size(col(vecCol)) >= m * subDim)
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"))
    val scored = enc.join(broadcast(q),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("__d",
        Similarity.dot(col("__recon"), col("__recon")) -
          lit(2.0) * Similarity.dot(col("__qv"), col("__recon")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__d"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  /** [[encode]] with the codebooks as a TABLE instead of plan literals —
    * the trained-model path for codebook sets too large to inline (the
    * [[QualityModel.scoreTable]] precedent: a plan-literal array ships
    * with every task and re-parses with every query; a big trained
    * codebook — OPQ with 2⁸ codewords × many subspaces × high dims —
    * belongs in data). The join shape: subvectors explode to (id, j)
    * rows, the broadcast codebook table supplies all k codewords per
    * subspace, and a min_by over the same `dot(c,c) − 2·dot(sub,c)`
    * score — computed with the shared sequential-fold dot, so the codes
    * are bit-identical to [[encode]]'s on the same codebooks (spec-
    * pinned). Ties break toward the lower code via the (score, code)
    * struct ordering.
    *
    * Scale shape: one explode to m× rows (map-side), one broadcast hash
    * join (m·k codebook rows ship once per executor), one
    * map-side-combined min_by aggregate per (id, j), one regroup to the
    * codes array. Nothing doc-grained shuffles except the (id, j)
    * partials — at 100 TB this is the encode job's floor.
    *
    * @param codebooksDf (subspace: int, code: int, codeword:
    *                    array<double>) — k rows per subspace. */
  def encodeTable(df: DataFrame, idCol: String, vecCol: String,
                  m: Int, k: Int, subDim: Int,
                  codebooksDf: DataFrame): DataFrame = {
    require(m > 0 && k > 1 && subDim > 0, s"m=$m k=$k subDim=$subDim")
    val cb = broadcast(codebooksDf.select(
      col(codebooksDf.columns(0)).cast("int").as("__j"),
      col(codebooksDf.columns(1)).cast("int").as("__c"),
      col(codebooksDf.columns(2)).cast("array<double>").as("__cw")))
    val subs = spread(df).filter(size(col(vecCol)) >= m * subDim)
      .select(col(idCol), posexplode(array((0 until m).map(j =>
        slice(col(vecCol), j * subDim + 1, subDim)): _*)))
      .select(col(idCol), col("pos").as("__j"), col("col").as("__sub"))
    val scored = subs.join(cb, Seq("__j"))
      .select(col(idCol), col("__j"),
        struct(
          (Similarity.dot(col("__cw"), col("__cw")) -
            lit(2.0) * Similarity.dot(col("__sub"), col("__cw"))).as("s"),
          col("__c").as("c")).as("__sc"))
      .groupBy(col(idCol), col("__j"))
      .agg(min(col("__sc")).getField("c").as("__code"))
    scored.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__j"), col("__code"))))
        .as("__jc"))
      .select(col(idCol),
        transform(col("__jc"), e => e.getField("__code")).as("codes"))
  }

  /** Exact squared-L2 top-k — the ground truth [[adcTopK]]/[[ivfAdcTopK]]
    * approximate, for recall measurement ([[Similarity.recallAtK]] on a
    * query sample is what sizes m/k/probes for a corpus, the same
    * measure-don't-guess loop as `ann_recall_eval`). Same comparison
    * idiom on the RAW vectors (‖q‖² dropped), so the three rankings are
    * mutually comparable. Corpus never shuffles; queries broadcast. */
  def exactL2TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK=$topK")
    val c = spread(corpus).select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val scored = c.join(broadcast(q),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("__d",
        Similarity.dot(col("__cv"), col("__cv")) -
          lit(2.0) * Similarity.dot(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__d"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  /** IVF-then-PQ — the FAISS `IVFx,PQy` architecture and the actual
    * billion-vector serving shape: [[Similarity.axisCells]]' coarse
    * quantizer prunes the scan to the query's `probes` cells, and the
    * ADC kernel ranks only within them. Same determinism argument as
    * [[adcTopK]] (cell selection compares exact doubles; scores are
    * sequential-fold dots on literal-derived values).
    *
    * Scale shape: the corpus is bucketed by its ONE home cell at write
    * time (partition/bucket by `cell` — a query batch then reads only
    * probed buckets); queries broadcast with `probes` rows each. Nothing
    * here is query×corpus: the join is an equi-join on `cell`, cutting
    * ADC work to ~probes/cells of the corpus, and swapping the axis
    * cells for trained k-means centroids changes one expression. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, topK: Int, m: Int, k: Int, subDim: Int,
                 cellsM: Int = 4, probes: Int = 2,
                 seed: Long = Similarity.DefaultSeed): DataFrame = {
    require(topK > 0, s"topK=$topK")
    require(probes >= 1 && probes <= 2, s"probes=$probes not in 1..2")
    val cbs = codebooks(m, k, subDim, seed)
    val codes = codesCol(col(vecCol), m, k, subDim, cbs)
    val (cw, cr) = Similarity.axisCells(col(vecCol), cellsM)
    val okLen = size(col(vecCol)) >= math.max(m * subDim, cellsM)
    val enc = spread(corpus).filter(okLen)
      .select(col(idCol).as("neighbor_id"), cw.as("cell"),
        reconCol(codes, m, cbs).as("__recon"))
    val q = queries.filter(okLen)
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"),
        explode(array(Seq(cw, cr).take(probes): _*)).as("cell"))
    cellAdcRank(enc, q, topK)
  }

  /** The shared cell-join ADC ranker behind both IVF+PQ variants — ONE
    * copy of the join/self-exclusion/distance/window body, so the axis
    * and trained coarse quantizers can never diverge on scoring or
    * tie-break semantics. `enc` carries (neighbor_id, cell, __recon);
    * `q` carries (query_id, __qv, cell) and broadcasts (sampled query
    * sets — the eval posture of both callers). */
  private def cellAdcRank(enc: DataFrame, q: DataFrame,
                          topK: Int): DataFrame = {
    val scored = enc.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__d",
        Similarity.dot(col("__recon"), col("__recon")) -
          lit(2.0) * Similarity.dot(col("__qv"), col("__recon")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__d"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  /** [[ivfAdcTopK]] with the TRAINED coarse quantizer — the sentence in
    * that scaladoc ("swapping the axis cells for trained k-means
    * centroids changes one expression") made code: cells come from
    * [[Similarity.trainIvfCentroids]]' kmeans (the `ann_ivft_*`
    * family), so probes rank by real quantizer distance and `probes`
    * is a free knob up to the cell count — this is FAISS `IVFx,PQy`
    * with both stages as they're actually deployed (trained coarse
    * cells pruning the scan, PQ codes ranking within). Same ADC
    * determinism as [[adcTopK]]; the kmeans len-== dim universe
    * applies to both sides (training, cells and probes share it). */
  def ivfAdcTopKTrained(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, topK: Int,
                        m: Int, k: Int, subDim: Int,
                        centroids: IndexedSeq[Array[Double]],
                        probes: Int, dim: Int,
                        seed: Long = Similarity.DefaultSeed): DataFrame = {
    require(topK > 0, s"topK=$topK")
    require(probes >= 1 && probes <= centroids.length,
      s"probes=$probes out of [1, ${centroids.length}]")
    require(dim >= m * subDim,
      s"dim=$dim shorter than the $m×$subDim PQ layout")
    val cbs = codebooks(m, k, subDim, seed)
    val codes = codesCol(col(vecCol), m, k, subDim, cbs)
    val okLen = size(col(vecCol)) === dim
    val enc = spread(corpus).filter(okLen)
      .select(col(idCol).as("neighbor_id"),
        element_at(
          Similarity.trainedProbeCells(col(vecCol), centroids, 1), 1)
          .as("cell"),
        reconCol(codes, m, cbs).as("__recon"))
    val q = queries.filter(okLen)
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"),
        explode(Similarity.trainedProbeCells(col(vecCol), centroids,
          probes)).as("cell"))
    cellAdcRank(enc, q, topK)
  }
}
