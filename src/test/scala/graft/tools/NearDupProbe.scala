package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch perf probe — dev only: times the candidate-pair dedup family
  * after the score-before-dedup plan change. */
object NearDupProbe {
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

    Seq("embed_neardup_banded", "embed_cosine_neardup",
      "dedup_simhash_pairs", "dedup_ngram_jaccard", "dedup_containment")
      .foreach { n =>
        (1 to 2).foreach { round =>
          val t0 = System.nanoTime()
          val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
          println(f"PROBE $n%-24s r$round ${(System.nanoTime() - t0) / 1e9}%6.2f s ($cnt rows)")
        }
      }
    spark.stop()
  }
}
