package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, HammingDistance, L2Normalize, NfcNormalize}

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
  }
}
