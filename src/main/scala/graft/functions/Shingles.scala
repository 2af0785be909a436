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
