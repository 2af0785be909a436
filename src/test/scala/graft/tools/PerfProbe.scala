package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Dedup, TextAnalysis}

/** Scratch perf probe — dev only: times individual stages of the dedup
  * pipelines to localize bottlenecks at bench scale. */
object PerfProbe {
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

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    val docs = Tables.documents(spark, sfDir)
    t("read_docs") { docs.count() }
    val sh = Dedup.shingles(docs, "text", "doc_id", 3)
    t("shingles") { sh.count() }
    val shh = sh.select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))
    t("shingles_hashed") { shh.count() }
    import org.apache.spark.sql.expressions.Window
    val filtered = shh
      .withColumn("df_cnt", count(lit(1)).over(Window.partitionBy(col("sh_h"))))
      .filter(col("df_cnt") <= 50).drop("df_cnt")
    t("window_dfcnt") { filtered.count() }
    val a = filtered.select(col("sh_h"), col("doc_id").as("id_a"))
    val b = filtered.select(col("sh_h"), col("doc_id").as("id_b"))
    val shared = a.join(b, Seq("sh_h")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    t("pair_join_groupby") { shared.count() }
    t("full_ngram") {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.2, 50).count()
    }
    // variant: df-cap via groupBy+join instead of window (exchange reuse?)
    t("ngram_groupby_cap") {
      val cnt = shh.groupBy("sh_h").agg(count(lit(1)).as("c"))
        .filter(col("c") <= 50)
      val filt = shh.join(cnt.select("sh_h"), Seq("sh_h"))
      val a2 = filt.select(col("sh_h"), col("doc_id").as("id_a"))
      val b2 = filt.select(col("sh_h"), col("doc_id").as("id_b"))
      a2.join(b2, Seq("sh_h")).filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter")).count()
    }
    val sigs = Dedup.minhashSignatures(sh, "doc_id", 8)
    t("minhash_sigs") { sigs.count() }
    t("full_minhash") {
      Dedup.minhashLsh(docs, "text", "doc_id", 3, 8, 4).count()
    }
    spark.stop()
  }
}
