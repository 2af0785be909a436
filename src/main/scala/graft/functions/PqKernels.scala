package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-vector PQ encode kernels (r17 optimization round).
  *
  * The original [[graft.llm.Pq]] encode expression built, per subspace,
  * `array_min(array(k structs))` where every struct carried its own
  * codegen'd dot product — an m·k-term Catalyst tree (512 dot loops for
  * m=8, k=64) that Catalyst must analyze, optimize and Janino-compile
  * per plan, and whose per-row evaluation materializes k structs into an
  * array just to take their min. These two expressions collapse the
  * whole assignment into ONE compact generated loop over a
  * references-array codebook: O(1) plan size in m·k, no per-row struct
  * materialization, identical math.
  *
  * Numerics are bit-identical to the expression forest they replace:
  * per codeword, `s = selfDot(cb) − 2.0 · dot(sub, cb)` where the dot is
  * the same sequential left-fold over float→double-widened elements
  * [[DotProduct]] generates, `selfDot` is the same Scala fold
  * [[graft.llm.Pq.selfDot]] baked as a literal, and the argmin scans
  * codes ascending keeping strict improvements under Spark's nan-safe
  * double order (NaN greater than everything, ±0.0 equal) — exactly
  * `array_min`'s (s, c)-struct order with its low-code tie-break.
  *
  * Null semantics match the old chain where rows can reach it: a NULL
  * element anywhere in a subspace's slice nulls that subspace's dot for
  * every codeword, and the old (null, c)-structs min picked code 0 —
  * reproduced here directly. A NULL vector returns NULL (the old chain
  * produced all-zero codes there; every caller filters
  * `size(vec) >= m·subDim` first, which already drops NULL vectors, so
  * the difference is unobservable — asserted by PqKernelsSpec).
  * Vectors shorter than m·subDim (also filtered away by callers) score
  * partial dots over the available prefix exactly like the old
  * slice+[[DotProduct]] min-length fold.
  */
private[graft] trait PqKernelBase extends UnaryExpression
    with VectorArrayAccess {
  def m: Int
  def k: Int
  def subDim: Int
  /** Flattened codebooks: codeword (j, c) occupies
    * [((j·k)+c)·subDim, +subDim). An IndexedSeq (not Array) so case-class
    * equality stays structural — plan canonicalization and exchange
    * reuse depend on it. */
  def flatCb: IndexedSeq[Double]

  require(m > 0 && k > 1 && subDim > 0, s"m=$m k=$k subDim=$subDim")
  require(flatCb.length == m * k * subDim,
    s"flatCb.length=${flatCb.length} != $m*$k*$subDim")

  override def nullable: Boolean = true

  @transient protected lazy val cbArr: Array[Double] = flatCb.toArray
  /** selfDot per codeword, same fold as [[graft.llm.Pq.selfDot]]. */
  @transient protected lazy val sdArr: Array[Double] =
    Array.tabulate(m * k) { jc =>
      var acc = 0.0
      var i = 0
      while (i < subDim) {
        val x = cbArr(jc * subDim + i)
        acc += x * x
        i += 1
      }
      acc
    }

  /** The shared assignment loop (interpreted path). Returns null codes
    * as 0 per the null-subspace rule above. */
  protected def computeCodes(x: ArrayData): Array[Int] = {
    val n = x.numElements()
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      val lim = math.min(subDim, math.max(0, n - base))
      var subNull = false
      if (mayHaveNullElems(child)) {
        var i = 0
        while (i < lim && !subNull) {
          if (x.isNullAt(base + i)) subNull = true
          i += 1
        }
      }
      if (!subNull) {
        var best = 0.0
        var bestC = 0
        var c = 0
        while (c < k) {
          val off = (j * k + c) * subDim
          var dot = 0.0
          var i = 0
          while (i < lim) {
            dot += get(child, x, base + i) * cbArr(off + i)
            i += 1
          }
          val s = sdArr(j * k + c) - 2.0 * dot
          if (c == 0) { best = s; bestC = 0 }
          else if (s < best || (best.isNaN && !s.isNaN)) {
            best = s; bestC = c
          }
          c += 1
        }
        codes(j) = bestC
      } // else codes(j) stays 0
      j += 1
    }
    codes
  }

  /** Generated-code version of [[computeCodes]]; leaves the codes in
    * `int[] codesVar`. */
  protected def genCodesLoop(ctx: CodegenContext, v: String,
                             codesVar: String): String = {
    val cb = ctx.addReferenceObj("pqCb", cbArr, "double[]")
    val sd = ctx.addReferenceObj("pqSd", sdArr, "double[]")
    val n = ctx.freshName("n")
    val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val i = ctx.freshName("i")
    val base = ctx.freshName("base")
    val lim = ctx.freshName("lim")
    val off = ctx.freshName("off")
    val dot = ctx.freshName("dot")
    val s = ctx.freshName("s")
    val best = ctx.freshName("best")
    val bestC = ctx.freshName("bestC")
    val subNull = ctx.freshName("subNull")
    val nullScan =
      if (mayHaveNullElems(child))
        s"""for (int $i = 0; $i < $lim; $i++) {
           |  if ($v.isNullAt($base + $i)) { $subNull = true; break; }
           |}""".stripMargin
      else ""
    s"""
       |int $n = $v.numElements();
       |int[] $codesVar = new int[$m];
       |for (int $j = 0; $j < $m; $j++) {
       |  int $base = $j * $subDim;
       |  int $lim = java.lang.Math.min($subDim,
       |    java.lang.Math.max(0, $n - $base));
       |  boolean $subNull = false;
       |  $nullScan
       |  if (!$subNull) {
       |    double $best = 0.0; int $bestC = 0;
       |    for (int $c = 0; $c < $k; $c++) {
       |      int $off = ($j * $k + $c) * $subDim;
       |      double $dot = 0.0;
       |      for (int $i = 0; $i < $lim; $i++) {
       |        $dot += (${getter(child, v, s"$base + $i")}) * $cb[$off + $i];
       |      }
       |      double $s = $sd[$j * $k + $c] - 2.0 * $dot;
       |      if ($c == 0) { $best = $s; $bestC = 0; }
       |      else if ($s < $best ||
       |               (java.lang.Double.isNaN($best)
       |                 && !java.lang.Double.isNaN($s))) {
       |        $best = $s; $bestC = $c;
       |      }
       |    }
       |    $codesVar[$j] = $bestC;
       |  }
       |}
     """.stripMargin
  }
}

/** `codes[j] = argmin_c ‖sub_j − cb(j,c)‖²` for all m subspaces in one
  * loop — array<int> of length m. */
case class PqEncode(child: Expression, m: Int, k: Int, subDim: Int,
                    flatCb: IndexedSeq[Double]) extends PqKernelBase {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    UnsafeArrayData.fromPrimitiveArray(
      computeCodes(v.asInstanceOf[ArrayData]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      genCodesLoop(ctx, v, codes) +
        s"""
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($codes);
         """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Encode-then-reconstruct in one pass: the m·subDim concatenation of
  * each subspace's argmin codeword — what the ADC scan actually scores
  * against, skipping the intermediate codes array entirely. */
case class PqEncodeRecon(child: Expression, m: Int, k: Int, subDim: Int,
                         flatCb: IndexedSeq[Double]) extends PqKernelBase {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val codes = computeCodes(v.asInstanceOf[ArrayData])
    val out = new Array[Double](m * subDim)
    var j = 0
    while (j < m) {
      val off = (j * k + codes(j)) * subDim
      var i = 0
      while (i < subDim) { out(j * subDim + i) = cbArr(off + i); i += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCbR", cbArr, "double[]")
      val codes = ctx.freshName("codes")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      genCodesLoop(ctx, v, codes) +
        s"""
           |double[] $out = new double[${m * subDim}];
           |for (int $j = 0; $j < $m; $j++) {
           |  int $off = ($j * $k + $codes[$j]) * $subDim;
           |  for (int $i = 0; $i < $subDim; $i++) {
           |    $out[$j * $subDim + $i] = $cb[$off + $i];
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
