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
             seed: Long = Similarity.DefaultSeed): DataFrame = {
    require(m > 0 && k > 1 && subDim > 0, s"m=$m k=$k subDim=$subDim")
    val cbs = codebooks(m, k, subDim, seed)
    spread(df).filter(size(col(vecCol)) >= m * subDim)
      .select(col(idCol),
        codesCol(col(vecCol), m, k, subDim, cbs).as("codes"))
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
              seed: Long = Similarity.DefaultSeed): DataFrame = {
    require(topK > 0, s"topK=$topK")
    val cbs = codebooks(m, k, subDim, seed)
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
}
