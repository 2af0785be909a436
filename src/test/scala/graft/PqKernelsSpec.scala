package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.core.Tables
import graft.functions.{PqEncode, PqEncodeRecon}
import graft.llm.{Clustering, Pq, Similarity}

/** r17 optimization pin: the fused [[graft.functions.PqEncode]] /
  * [[graft.functions.PqEncodeRecon]] codegen kernels must reproduce the
  * expression forest they replaced — per subspace,
  * `array_min(array(struct(selfDot(cb) − 2·dot(sub, cb), c)...)).c` over
  * plan-literal codebooks, and the `element_at(typedlit(book), code+1)`
  * reconstruction — BIT FOR BIT, because every PQ oracle replays that
  * algebra. The old formulation is rebuilt inline here as the reference.
  */
class PqKernelsSpec extends SparkSpec {

  /** The pre-r17 codesCol, verbatim (array_sort argmin = array_min under
    * the same (s, c) struct order). */
  private def oldCodesCol(vec: Column, m: Int, k: Int, subDim: Int,
      cbs: IndexedSeq[IndexedSeq[Array[Double]]]): Column = {
    val perSub = (0 until m).map { j =>
      val sub = slice(vec, j * subDim + 1, subDim)
      val scored = (0 until k).map { c =>
        val cb = cbs(j)(c)
        val s = lit(Pq.selfDot(cb)) -
          lit(2.0) * Similarity.dot(sub, typedlit(cb.toSeq))
        struct(s.as("s"), lit(c).as("c"))
      }
      array_sort(array(scored: _*)).getItem(0).getField("c")
    }
    array(perSub: _*)
  }

  /** The pre-r17 reconCol over a codes column, verbatim. */
  private def oldReconCol(codes: Column, m: Int,
      cbs: IndexedSeq[IndexedSeq[Array[Double]]]): Column =
    flatten(array((0 until m).map { j =>
      element_at(typedlit(cbs(j).map(_.toSeq)), element_at(codes, j + 1) + 1)
    }: _*))

  private def flat(cbs: IndexedSeq[IndexedSeq[Array[Double]]]) =
    cbs.flatMap(_.flatMap(_.toIndexedSeq))

  private def newCodes(vec: Column, m: Int, k: Int, subDim: Int,
      cbs: IndexedSeq[IndexedSeq[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec),
      m, k, subDim, flat(cbs)))

  private def newRecon(vec: Column, m: Int, k: Int, subDim: Int,
      cbs: IndexedSeq[IndexedSeq[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeRecon(ColumnBridge.expression(vec),
      m, k, subDim, flat(cbs)))

  private def assertKernelsMatch(vec: Column, base: org.apache.spark.sql.DataFrame,
      m: Int, k: Int, subDim: Int,
      cbs: IndexedSeq[IndexedSeq[Array[Double]]]): Unit = {
    val diff = base.select(
        oldCodesCol(vec, m, k, subDim, cbs).as("oc"),
        newCodes(vec, m, k, subDim, cbs).as("nc"),
        oldReconCol(oldCodesCol(vec, m, k, subDim, cbs), m, cbs).as("or"),
        newRecon(vec, m, k, subDim, cbs).as("nr"))
      .filter(col("oc") =!= col("nc") || col("or") =!= col("nr"))
    assert(diff.count() == 0L,
      s"PQ kernel diverged from the expression forest (m=$m k=$k)")
  }

  test("PqEncode/PqEncodeRecon match the old expression forest on the " +
    "fixture corpus (seeded + trained books, raw + residual inputs)") {
    val e = Tables.embeddings(spark, sf001)
      .filter(size(col("embedding")) === 64)
    // seeded books, raw vectors (the adcTopK family)
    assertKernelsMatch(col("embedding"), e, m = 8, k = 16, subDim = 8,
      Pq.codebooks(8, 16, 8))
    // wide-codebook leg (the ann_ivfpq_mk (8,64) shape)
    assertKernelsMatch(col("embedding"), e, m = 8, k = 64, subDim = 8,
      Pq.codebooks(8, 64, 8))
    // trained books over quantized vectors (the trainCodebooks output
    // regime — dyadic grid inputs)
    val eq = e.select(col("vec_id"),
      Clustering.quantize(col("embedding")).as("qvec"))
    val trained = Pq.trainCodebooks(eq, "vec_id", "qvec",
      m = 8, k = 16, subDim = 8, iters = 1)
    assertKernelsMatch(col("qvec"), eq, m = 8, k = 16, subDim = 8, trained)
  }

  test("PqEncode matches the forest on adversarial literals: ties, " +
    "negatives, NaN-free zeros, short and null-element vectors") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true))))
    val rows = Seq(
      Seq(0.0, 0.0, 0.0, 0.0),                   // ties → lowest code
      Seq(1.0, -1.0, 0.5, -0.25),
      Seq(-0.0, 0.0, -0.0, 0.0),                 // signed-zero ties
      Seq(2.0, 2.0),                             // short: partial dots
      Seq(1.0, null, 0.5, 0.25)                  // null element → code 0
    ).map(s => org.apache.spark.sql.Row(s.map(_.asInstanceOf[Any])))
    val df = spark.createDataFrame(rows.asJava, schema)
    val cbs = Pq.codebooks(2, 4, 2)
    val diff = df.select(
        oldCodesCol(col("v"), 2, 4, 2, cbs).as("oc"),
        newCodes(col("v"), 2, 4, 2, cbs).as("nc"))
      .filter(col("oc") =!= col("nc"))
    assert(diff.count() == 0L, "edge-case codes diverged")
  }

  test("trainCodebooks (PqEncode-assigned rounds) reproduces the pinned " +
    "2-iteration books the oracle replays") {
    // the residual-book training feeding every ann_ivfpq* oracle: if the
    // r17 assignment restructure changed ANY code, these books — and
    // every downstream oracle row — would move. Train twice, compare the
    // two derivations' determinism, and pin against the old-forest
    // assignment replayed manually for one round.
    val e = Tables.embeddings(spark, sf001)
      .filter(size(col("embedding")) === 64)
    val eq = e.select(col("vec_id"),
      Clustering.quantize(col("embedding")).as("qvec"))
    val a = Pq.trainCodebooks(eq, "vec_id", "qvec", 8, 16, 8, iters = 2)
    val b = Pq.trainCodebooks(eq, "vec_id", "qvec", 8, 16, 8, iters = 2)
    assert(a.flatten.flatten == b.flatten.flatten, "training not deterministic")
    // one-round manual replay with the OLD forest assignment
    val init = {
      val first = eq.orderBy(col("vec_id")).limit(16).collect()
        .map(_.getSeq[Double](1).toArray)
      (0 until 8).map(j => first.toIndexedSeq.map(
        _.slice(j * 8, (j + 1) * 8)))
    }
    val sums = eq
      .select(oldCodesCol(col("qvec"), 8, 16, 8, init).as("codes"),
        posexplode(col("qvec")))
      .select((col("pos") / lit(8)).cast("int").as("j"),
        element_at(col("codes"), (col("pos") / lit(8)).cast("int") + 1)
          .as("c"),
        (col("pos") % lit(8)).cast("int").as("p"), col("col"))
      .groupBy("j", "c", "p")
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .collect()
    val byJc = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
    val manual = init.zipWithIndex.map { case (book, j) =>
      book.zipWithIndex.map { case (prev, c) =>
        byJc.get((j, c)) match {
          case Some(rs) =>
            val arr = new Array[Double](8)
            rs.foreach(r => arr(r.getInt(2)) = r.getDouble(3) / r.getLong(4))
            arr.toIndexedSeq
          case None => prev.toIndexedSeq
        }
      }
    }
    val oneRound = Pq.trainCodebooks(eq, "vec_id", "qvec", 8, 16, 8,
      iters = 1)
    assert(oneRound.map(_.map(_.toIndexedSeq)) == manual,
      "PqEncode-assigned Lloyd round diverged from the old-forest round")
  }

  test("trainCodebooksSnapshots: snapshot(i) is bit-identical to an " +
    "independent training run at depth i (Lloyd rounds nest)") {
    // the property ann_ivfpq_iters' one-run sweep rests on: the books
    // after i rounds of a longer run equal a standalone iters=i run
    val e = Tables.embeddings(spark, sf001)
      .filter(size(col("embedding")) === 64)
    val eq = e.select(col("vec_id"),
      Clustering.quantize(col("embedding")).as("qvec"))
    val snaps = Pq.trainCodebooksSnapshots(eq, "vec_id", "qvec",
      m = 8, k = 16, subDim = 8, snapshots = Seq(1, 2, 4))
    for (i <- Seq(1, 2, 4)) {
      val solo = Pq.trainCodebooks(eq, "vec_id", "qvec", 8, 16, 8,
        iters = i)
      assert(snaps(i).flatten.flatten.toSeq == solo.flatten.flatten.toSeq,
        s"snapshot($i) diverged from an independent iters=$i run")
    }
  }
}
