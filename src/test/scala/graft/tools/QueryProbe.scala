package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch perf probe — dev only: times the named SparkEntry queries at
  * `$SPARK_GRAFT_SF_DIR` (default sf0.1), two passes each so the second
  * reading is free of JIT/codegen warmup.
  *
  * Usage: `sbt "Test/runMain graft.tools.QueryProbe dedup_winnow winnow_fp"`
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (pass <- 1 to 2; name <- args) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"PROBE pass$pass $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    spark.stop()
  }
}
