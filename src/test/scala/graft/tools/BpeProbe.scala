package graft.tools
import org.apache.spark.sql.SparkSession

/** Timing probe for deep BPE training: in-JVM wall time of the 6-merge
  * and 500-budget paths at a given SF, isolating loop cost from session
  * startup (backs the SCALE.md §9d sub-linearity numbers). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, d)
    docs.count() // warm the scan
    for (m <- Seq(6, 30, 500)) {
      val t0 = System.nanoTime()
      val n = graft.llm.Bpe.train(docs, "text", merges = m).count()
      println(f"merges=$m%-4d rounds=$n%-4d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
