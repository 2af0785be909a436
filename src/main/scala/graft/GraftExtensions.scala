package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.{AllShinglesExpr, CharWindowsExpr, DistinctShingles,
  DotProduct, HammingDistance, Int8Snap, L2Normalize, MinHashSignature,
  NfcNormalize, NgramStats, SimHash64, WinnowFingerprints}

/** `SparkSessionExtensions` installer: registers the engine's custom
  * codegen expressions as SQL functions so `spark.sql` queries (and the
  * thrift/connect surfaces) can call them directly:
  *
  * {{{
  *   spark.sql("SELECT vec_dot(l2_normalize(a.v), l2_normalize(b.v)) ...")
  * }}}
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * The DataFrame surface ([[graft.functions.VectorOps]]) works without it.
  */
object GraftExtensions {
  // a wrong-arity SQL call surfaces as the standard WRONG_NUM_ARGS
  // AnalysisException, not an IndexOutOfBoundsException from args(i)
  private[graft] def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n)
        org.apache.spark.sql.graftbridge.ColumnBridge
          .wrongNumArgs(name, n, args.length)
      build(args)
    }

  /** Kernel parameters (shingle n, signature k) are constructor Ints on
    * the expression, not child expressions — a SQL call must pass them as
    * INT literals, extracted here at resolution time. */
  private[graft] def litInt(fn: String, argName: String, e: Expression): Int =
    e match {
      case Literal(v: Int, IntegerType) => v
      // any other foldable INT (e.g. a bridge-wrapped or folded literal)
      case f if f.foldable && f.dataType == IntegerType =>
        f.eval() match {
          case v: Int => v
          case _ => throw new IllegalArgumentException(
            s"$fn: $argName must be a non-null INT literal")
        }
      case other => throw new IllegalArgumentException(
        s"$fn: $argName must be an INT literal, got $other")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.arity

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      arity("vec_dot", 2)(args => DotProduct(args(0), args(1)))))
    ext.injectFunction((
      FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(classOf[L2Normalize].getName, "l2_normalize"),
      arity("l2_normalize", 1)(args => L2Normalize(args.head))))
    ext.injectFunction((
      FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      arity("hamming", 2)(args => HammingDistance(args(0), args(1)))))
    ext.injectFunction((
      FunctionIdentifier("nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc"),
      arity("nfc", 1)(args => NfcNormalize(args.head))))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[DistinctShingles].getName, "shingles"),
      arity("shingles", 2)(args => DistinctShingles(args(0),
        GraftExtensions.litInt("shingles", "n", args(1))))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName,
        "minhash_signature"),
      arity("minhash_signature", 2)(args => MinHashSignature(args(0),
        GraftExtensions.litInt("minhash_signature", "k", args(1))))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      arity("simhash64", 1)(args => SimHash64(args.head))))
    ext.injectFunction((
      FunctionIdentifier("ngram_stats"),
      new ExpressionInfo(classOf[NgramStats].getName, "ngram_stats"),
      arity("ngram_stats", 2)(args => NgramStats(args(0),
        GraftExtensions.litInt("ngram_stats", "n", args(1))))))
    ext.injectFunction((
      FunctionIdentifier("int8_snap"),
      new ExpressionInfo(classOf[Int8Snap].getName, "int8_snap"),
      arity("int8_snap", 1)(args => Int8Snap(args.head))))
    ext.injectFunction((
      FunctionIdentifier("char_windows"),
      new ExpressionInfo(classOf[CharWindowsExpr].getName, "char_windows"),
      arity("char_windows", 3)(args => CharWindowsExpr(args(0),
        GraftExtensions.litInt("char_windows", "window", args(1)),
        GraftExtensions.litInt("char_windows", "stride", args(2))))))
    ext.injectFunction((
      FunctionIdentifier("all_shingles"),
      new ExpressionInfo(classOf[AllShinglesExpr].getName, "all_shingles"),
      arity("all_shingles", 2)(args => AllShinglesExpr(args(0),
        GraftExtensions.litInt("all_shingles", "n", args(1))))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName,
        "winnow_fingerprints"),
      arity("winnow_fingerprints", 3)(args => WinnowFingerprints(args(0),
        GraftExtensions.litInt("winnow_fingerprints", "k", args(1)),
        GraftExtensions.litInt("winnow_fingerprints", "w", args(2))))))
  }
}
