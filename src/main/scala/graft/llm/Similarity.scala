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

  /** cosine(a, b) over array columns, in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

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

  /** Bucket key from the signs of the first `b` vector components —
    * a deterministic, engine-portable LSH family (axis-aligned
    * hyperplanes). Random-rotation hyperplanes are a drop-in upgrade. */
  def signBucket(vec: Column, b: Int): Column =
    concat((0 until b).map(i =>
      when(element_at(vec, i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** ANN via sign-LSH: candidates share the query's bucket; top-k within.
    * Recall is tunable with `b` (fewer bits → bigger buckets → higher
    * recall, more compute). Returns same shape as [[bruteForceTopK]]. */
  def signLshTopK(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int, b: Int,
                  roundScore: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"),
      signBucket(col(vecCol), b).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("cv"),
      signBucket(col(vecCol), b).as("bucket"))
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
    val q = queries.select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"),
      explode(array(Seq(cw, cr).take(probes): _*)).as("cell"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("cv"), cw.as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", dot(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), roundScore).as("score"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, LSH-blocked:
    * only same-bucket pairs are scored (id_a < id_b). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, b: Int,
                         roundScore: Int = 6): DataFrame = {
    val withBucket = df.select(col(idCol),
      normalize(col(vecCol)).as("nv"),
      signBucket(col(vecCol), b).as("bucket"))
    val a = withBucket.select(col("bucket"), col(idCol).as("id_a"),
      col("nv").as("va"))
    val bb = withBucket.select(col("bucket"), col(idCol).as("id_b"),
      col("nv").as("vb"))
    a.join(bb, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(dot(col("va"), col("vb")), roundScore))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }
}
