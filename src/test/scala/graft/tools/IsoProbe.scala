package graft.tools
import org.apache.spark.sql.SparkSession
object IsoProbe {
  def main(args: Array[String]): Unit = {
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
    var t0 = System.nanoTime()
    val qs = graft.SparkEntry.queries
    println(f"ISO map_init ${(System.nanoTime()-t0)/1e9}%6.2f s")
    for (n <- args.toSeq; pass <- 1 to 3) {
      t0 = System.nanoTime()
      val df = qs(n)(spark, sfDir)
      val tBuild = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPlan = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime()
      df.count()
      val tExec = (System.nanoTime()-t0)/1e9
      println(f"ISO $n pass$pass build=$tBuild%5.2f plan=$tPlan%5.2f exec=$tExec%5.2f")
    }
    spark.stop()
  }
}
