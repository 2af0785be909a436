package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, in one pass.
  *
  * The composable form — `array_distinct(transform(sequence(0, size-n),
  * i => array_join(slice(toks, i+1, n), " ")))` — evaluates four nested
  * higher-order functions per row with a fresh array allocation per
  * shingle; at bench scale that chain alone dominated the dedup pipelines
  * (~4 s of a 6 s query). This expression does the same work in a single
  * tight loop (first-occurrence order, exact same strings: tokens joined
  * by one space), invoked as one call per row from inside whole-stage
  * codegen.
  */
object Shingles {
  /** Loop body shared by eval and generated code (static forwarder makes
    * it callable from Janino-compiled Java). */
  def distinctShingles(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      var s = toks.getUTF8String(i)
      var j = 1
      while (j < n) {
        s = UTF8String.concat(s, Shingles.space, toks.getUTF8String(i + j))
        j += 1
      }
      seen.add(s)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  val space: UTF8String = UTF8String.fromString(" ")

  def distinctShingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(DistinctShingles(ColumnBridge.expression(tokens), n))
}

case class DistinctShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Shingles.distinctShingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Shingles.distinctShingles($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL word n-gram shingles of a token array (duplicates kept, position
  * order) — the frequency-weighted counterpart of [[Shingles]] for
  * operators that weight features by occurrence (DSIR bucket counts,
  * SimHash). Same single-loop rationale: the composable
  * `transform(sequence(...), i => concat_ws(...))` chain evaluates its
  * lambda per element outside whole-stage codegen. */
object AllShingles {
  def allShingles(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var s = toks.getUTF8String(i)
      var j = 1
      while (j < n) {
        s = UTF8String.concat(s, Shingles.space, toks.getUTF8String(i + j))
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  def allShingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(
      AllShinglesExpr(ColumnBridge.expression(tokens), n))
}

case class AllShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"n=$n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    AllShingles.allShingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.AllShingles.allShingles($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sliding character windows of a string (`window` chars every `stride`),
  * in one pass. The composable `transform(sequence(...), i => substr)`
  * form evaluates its lambda per element OUTSIDE whole-stage codegen and
  * allocates the index array per row — ~10× the cost of this single loop
  * at bench scale (the binary-simhash shingler was the motivating case).
  * Windows keep duplicates (SimHash weights by frequency); a string
  * shorter than one window yields an empty array. */
object CharWindows {
  def charWindows(s: UTF8String, window: Int, stride: Int): ArrayData = {
    val len = s.numChars()
    if (len < window) return new GenericArrayData(Array.empty[Any])
    val n = (len - window) / stride + 1
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = s.substring(i * stride, i * stride + window)
      i += 1
    }
    new GenericArrayData(out)
  }

  def charWindows(str: Column, window: Int, stride: Int): Column =
    ColumnBridge.column(
      CharWindowsExpr(ColumnBridge.expression(str), window, stride))
}

case class CharWindowsExpr(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {
  require(window > 0 && stride > 0 && stride <= window,
    s"window=$window stride=$stride")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    CharWindows.charWindows(v.asInstanceOf[UTF8String], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CharWindows.charWindows($v, $window, $stride);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
