package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val edges = graft.llm.Similarity.mutualKnnEdges(
      graft.llm.Similarity.knnGraph(graft.core.Tables.embeddings(spark, d),
        "vec_id", "embedding", k = 3, b = 4, dim = 64, bands = 2))
      .select("id_a", "id_b").localCheckpoint()
    println(f"edges ${edges.count()} in ${(System.nanoTime()-t0)/1e9}%.2f s")
    val t1 = System.nanoTime()
    val (lab, rounds) = graft.llm.Dedup.clustersStarWithRounds(edges, "id_a", "id_b", 30)
    println(f"star: ${lab.count()} labels, $rounds rounds, ${(System.nanoTime()-t1)/1e9}%.2f s")
    spark.stop()
  }
}
