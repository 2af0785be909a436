package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Sampling, TextAnalysis}

/** Scratch perf probe — dev only: localizes the sample_stratified cost
  * (langId expression vs window vs planning/codegen). */
object StratProbe {
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
    val withLang = docs.withColumn("lang_id", TextAnalysis.langId(col("text")))
    t("langid_only") { withLang.select("doc_id", "lang_id").count() }
    t("stratified_1st") {
      Sampling.stratified(withLang, "lang_id", "doc_id", 50)
        .select("doc_id", "lang_id").count()
    }
    t("stratified_2nd") {
      Sampling.stratified(withLang, "lang_id", "doc_id", 50)
        .select("doc_id", "lang_id").count()
    }
    t("stratified_projected") {
      Sampling.stratified(withLang.select("doc_id", "lang_id"),
        "lang_id", "doc_id", 50)
        .select("doc_id", "lang_id").count()
    }
    t("stratified_on_native_lang") {
      Sampling.stratified(docs, "lang", "doc_id", 50)
        .select("doc_id", "lang").count()
    }
    spark.stop()
  }
}
