package graft

/** SCALE.md §3's co-location claim, demonstrated: two tables bucketed on
  * the join key join with NO Exchange on either side — the write-time
  * layout replaces the per-query shuffle, which is the 100 TB strategy
  * for the stored-inventory and enrichment-store joins. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    // the warehouse DIR outlives the in-memory catalog across JVM runs —
    // clear stale locations or the managed-table create collides
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete()
    }
    Seq("b_facts", "b_dims").foreach(n =>
      rm(new java.io.File("spark-warehouse", n)))
    val facts = (1 to 1000).map(i => (i % 50, s"v$i")).toDF("key", "payload")
    val dims = (0 until 50).map(i => (i, s"d$i")).toDF("key", "attr")
    facts.write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("b_facts")
    dims.write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("b_dims")
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.enabled" ->
        spark.conf.get("spark.sql.adaptive.enabled"))
    // force the sort-merge path (broadcast would trivially avoid shuffles)
    // and a static plan so the Exchange assertion reads the real thing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 1000)
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("site-partitioned store write prunes partitions on the site filter") {
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_part_store").getPath
    graft.core.Tables.resources(spark, sf001)
      .write.mode("overwrite").partitionBy("resource_site").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter($"resource_site" === "NATION_3")
      .select("resource_id")
    val scan = q.queryExecution.executedPlan.toString
    // the site predicate becomes a PartitionFilters entry — only that
    // site's directory is listed/read (S1's Redis key-prefix narrowing,
    // done by layout instead of key encoding)
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("resource_site"), scan)
    assert(q.count() > 0)
  }
}
