package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.TextAnalysis

/** Scratch probe — dev only: splits the MinHash-LSH candidate pipeline
  * into stages to localize sf1 cost. */
object LshStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    val docs = Tables.documents(spark, sfDir)
    val ws = TextAnalysis.tokens(col("text"))
    for (_ <- 1 to 2) {
      t("scan+tokens") {
        docs.select(size(ws).as("n")).agg(sum("n")).head(); docs.count()
      }
      t("shingles") {
        docs.filter(size(ws) >= 3).select(
          size(graft.functions.Shingles.distinctShingles(ws, 3)).as("n"))
          .agg(sum("n")).head().getLong(0)
      }
      t("signatures") {
        docs.filter(size(ws) >= 3).select(
          graft.functions.MinHashUtil.signatures(
            graft.functions.Shingles.distinctShingles(ws, 3), 8).as("s"))
          .select(element_at(col("s"), 1)).distinct().count()
      }
      t("full minhashLsh") {
        graft.llm.Dedup.minhashLsh(docs, "text", "doc_id").count()
      }
    }
    spark.stop()
  }
}
