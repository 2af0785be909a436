package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 symmetric embedding quantization — the standard 4× shrink for
  * vector corpora before ANN serving (FAISS `SQ8` / `ScalarQuantizer`
  * family). Per vector: `scale = amax / 127`, `q_i = clamp(round(x_i /
  * scale), ±127)`, dequantized value `q_i · scale`.
  *
  * Scale shape (100 TB): strictly map-side — every expression here is a
  * per-row column computation over the embedding array; no shuffle, no
  * state, vectors never leave their input partition. Quantizing a corpus
  * is a single scan-transform-write pass, and the 4× size cut compounds
  * into every downstream shuffle of the ANN pipeline.
  *
  * Determinism: all arithmetic is double (floats widened first);
  * `round()` is half-away-from-zero in both Spark and DuckDB, so the
  * quantized grid is engine-portable bit-for-bit.
  */
object Quantize {

  private def asDouble(vecCol: Column): Column =
    transform(vecCol, x => x.cast("double"))

  /** max |x_i| of the vector, in double. Null/empty vectors yield null. */
  def absMax(vecCol: Column): Column =
    array_max(transform(vecCol, x => abs(x.cast("double"))))

  /** The int8 codes as array<int> in [-127, 127]. A zero / empty vector
    * quantizes to all-zero codes (scale degenerates, nothing to encode). */
  def int8Codes(vecCol: Column): Column = {
    val amax = absMax(vecCol)
    when(amax.isNull || amax === 0.0,
      transform(vecCol, _ => lit(0)))
      .otherwise(transform(asDouble(vecCol), x =>
        greatest(lit(-127.0), least(lit(127.0),
          round(x * 127.0 / amax))).cast("int")))
  }

  /** Quantize `vecCol`, keeping (idCol, scale, codes). `scale` is the
    * dequantization multiplier (amax / 127). */
  def quantize(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      (absMax(col(vecCol)) / 127.0).as("scale"),
      int8Codes(col(vecCol)).as("codes"))

  /** Dequantized vector from (codes, scale) — array<double>. */
  def dequantize(codesCol: Column, scaleCol: Column): Column =
    transform(codesCol, q => q.cast("double") * scaleCol)

  /** The quantize→dequantize round trip in ONE codegen pass
    * ([[graft.functions.Int8Snap]]) — for serving paths that dequantize
    * immediately; bit-identical to `dequantize(int8Codes(v), scale)`
    * (property-pinned) without the three interpreted `transform`
    * lambdas. */
  def snap(vecCol: Column): Column =
    graft.functions.VectorOps.int8Snap(vecCol)

  /** Per-vector quantization report: dimension count, amax, and the mean
    * squared reconstruction error — the fidelity audit a corpus-wide
    * quantization job should emit. Rounded (6/12 dp) for cross-engine
    * hash comparison; the error sum runs in array order (sequential fold,
    * not a shuffle agg), so it is deterministic before rounding too. */
  def int8Stats(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val vec = asDouble(col(vecCol))
    val amax = absMax(col(vecCol))
    val scale = amax / 127.0
    val dequant = dequantize(int8Codes(col(vecCol)), scale)
    val sqErrSum = aggregate(
      zip_with(vec, dequant, (x, xq) => (x - xq) * (x - xq)),
      lit(0.0), (acc, e) => acc + e)
    df.select(col(idCol),
      size(col(vecCol)).as("n_dims"),
      round(amax, 6).as("amax"),
      when(amax.isNull || amax === 0.0, lit(0.0))
        .otherwise(round(sqErrSum / size(col(vecCol)), 12)).as("mse"))
  }
}
