package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.functions.{Shingles, VectorOps}

/** The custom codegen expressions (vector kernels + shingling) against
  * their composable higher-order-function formulations — the perf path
  * must be numerically/semantically identical to the portable one. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("codegen dot product matches aggregate(zip_with(...)) exactly") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5, -1.0, 2.0)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0, 1.0, 1.0)))
      .toDF("vf", "vd")
    val hof = aggregate(
      zip_with(transform(col("vf"), _.cast("double")), col("vd"),
        (p, q) => p * q),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(VectorOps.dot(col("vf"), col("vd")).as("fast"),
      hof.as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null array elements null the result, matching the HOF fold") {
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(2.0), Some(3.0))),
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(2.0), Some(3.0))))
      .toDF("a", "b")
    val out = df.select(
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.l2normalize(col("a")).as("n")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).getDouble(0) == 8.0)
    assert(!out(1).isNullAt(1))
  }

  test("codegen l2 normalize widens floats and divides by the l2 norm") {
    val out = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("v")
      .select(VectorOps.l2normalize(col("v")).as("n"))
      .as[Seq[Double]].head()
    assert(out == Seq(0.6, 0.8))
  }

  test("distinct shingles: windowing, first-occurrence dedup, short input") {
    val out = Seq("a b c b a b c", "a b").toDF("text")
      .select(Shingles.distinctShingles(split(col("text"), "\\s+"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c b", "c b a", "b a b"))
    assert(out(1) == Seq.empty)
  }

  test("extensions installer registers the SQL functions") {
    // a live session can't re-run injection; assert the injector wires
    // cleanly into a fresh SparkSessionExtensions instance
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
