package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe — dev only: smoke the SQL-registered kernel functions in
  * a real extensions-configured session. */
object SqlFnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(
      """SELECT shingles(array('a','b','c','b','c'), 2) AS sh,
        |       minhash_signature(shingles(array('a','b','c'), 2), 4) AS sig,
        |       simhash64(array('a','b','c')) AS sim,
        |       ngram_stats(array('a','b','a','b'), 2) AS st,
        |       vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot
        |""".stripMargin).show(truncate = false)
    spark.stop()
  }
}
