package graft

import org.apache.spark.sql.SparkSession

import graft.core.Tables

/** SQL-surface entry point: register the test-fixture tables (and the
  * derived `resources` inventory) as temp views so the whole engine is
  * reachable from `spark.sql` — with `graft.GraftExtensions` configured,
  * that includes the custom functions (`vec_dot`, `l2_normalize`,
  * `hamming`). */
object Graft {
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def attachViews(spark: SparkSession, sfDir: String): Unit = {
    tableNames.foreach(n =>
      Tables.table(spark, sfDir, n).createOrReplaceTempView(n))
    Tables.resources(spark, sfDir).createOrReplaceTempView("resources")
  }
}
