package graft.tools
import org.apache.spark.sql.SparkSession
object KnnSf1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/tmp/sf1")
    for (name <- Seq("knn_graph", "graph_pagerank", "graph_components")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, d).count()
      println(f"KNNPROBE $name%-18s ${(System.nanoTime()-t0)/1e9}%7.2f s ($n rows)")
    }
    spark.stop()
  }
}
