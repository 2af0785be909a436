package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch perf probe — dev only: splits snmp_dsl query time into plan
  * construction+analysis vs execution (is the DSL cost Catalyst overhead
  * or actual work?). */
object DslProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    Seq("snmp_dsl_indexed", "snmp_dsl_partial", "snmp_dsl_toplevel",
      "mg_assemble").foreach { n =>
      (1 to 2).foreach { round =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization
        val t2 = System.nanoTime()
        val cnt = df.count()
        val t3 = System.nanoTime()
        println(f"PROBE $n%-18s r$round build=${(t1 - t0) / 1e9}%5.2f " +
          f"plan=${(t2 - t1) / 1e9}%5.2f exec=${(t3 - t2) / 1e9}%5.2f ($cnt rows)")
      }
    }
    spark.stop()
  }
}
