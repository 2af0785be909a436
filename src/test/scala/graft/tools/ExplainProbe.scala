package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe — dev only: dumps formatted physical plans for headline
  * queries (evidence for SCALE.md's plan-shape claims). */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing", "q3_shipping", "j1_enrichment_join", "a1_rate",
      "dsl_filter_mega", "ann_ivf_topk")
    names.foreach { n =>
      println(s"===== PLAN $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
