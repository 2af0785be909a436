package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test tables (TESTDATA.md) plus derived
  * reference-shaped views.
  *
  * Scale notes: every loader is a plain parquet scan — Catalyst pushes
  * filters and prunes columns into the scan, so downstream operators decide
  * I/O, not this layer. At 100 TB the same code works against a
  * partitioned table root (`spark.read.parquet(dir)`), with partition
  * pruning on the pushed predicates.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread an under-partitioned input across the session's cores before
    * a COMPUTE-heavy map stage. Parquet scan parallelism is bounded by
    * row groups — a single-row-group file (the driver fixtures; any
    * small-but-dense table) scans as ONE task, serializing kernels that
    * do real per-row work (MinHash signatures, winnowing, simhash). One
    * round-robin exchange of the projected columns unlocks cores×
    * parallelism; when the scan already has enough partitions (the
    * production case: many files × many row groups) this is a no-op and
    * adds nothing to the plan. */
  def spread(df: DataFrame): DataFrame = {
    // streaming frames: partitioning comes from the source (Kafka topic
    // partitions etc.) and df.rdd would throw — pass through untouched,
    // keeping the map-only operators streaming-compatible
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")

  /** Epoch-microseconds Column for the events table's `ts`, whatever
    * physical type the test-data generator shipped: parquet ns timestamps
    * arrive as LONG nanos (under spark.sql.legacy.parquet.nanosAsLong),
    * µs timestamps as TIMESTAMP/TIMESTAMP_NTZ (the session runs in UTC,
    * so the NTZ→TZ cast is an epoch no-op). Centralized here because the
    * driver has shipped BOTH encodings across rounds — every query goes
    * through this instead of hand-dividing `ts`. */
  def tsMicros(ev: DataFrame): org.apache.spark.sql.Column =
    ev.schema("ts").dataType match {
      // FLOOR division, not `div`'s truncation-toward-zero: DuckDB's
      // epoch_us FLOORS a negative ns timestamp's sub-µs part (-1500 ns
      // → -2 µs), and pre-1970 timestamps are in contract (ohlc). For
      // ts ≥ 0 the correction term is always 0.
      case org.apache.spark.sql.types.LongType =>
        expr("(ts div 1000) + (CASE WHEN ts % 1000 < 0 THEN -1 ELSE 0 END)")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

  /** events + a normalized `ts_us` (epoch µs) column; derive coarser
    * grains downstream with [[tsSecondsExpr]] (floor division — a bare
    * `ts_us div 1000000` truncates toward zero and disagrees with the
    * oracles' epoch_ns floor on pre-1970 rows). */
  def eventsUs(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    ev.withColumn("ts_us", tsMicros(ev))
  }

  /** Epoch-seconds from the normalized `ts_us`, as FLOOR division (the
    * same negative-timestamp correction [[tsMicros]] applies one grain
    * up; DuckDB's `epoch_ns(ts) // 1000000000` floors too). */
  val tsSecondsExpr: String =
    "(ts_us div 1000000) + (CASE WHEN ts_us % 1000000 < 0 THEN -1 ELSE 0 END)"
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** A reference-shaped `resources` inventory derived deterministically from
    * customer × nation (FIXTURES.md §B: "resource inventory ↔
    * supplier/customer (entity + attributes)").
    *
    * The fixed fields map onto customer attributes; `resource_metadata` is a
    * map column exactly like the reference's metadata
    * (`framework/resources.py:105-118`). The oracle SQL for DSL queries
    * re-derives the same view from raw parquet columns.
    */
  def resources(spark: SparkSession, sfDir: String): DataFrame = {
    val c = customer(spark, sfDir)
    val n = nation(spark, sfDir)
    // nation is tiny (25 rows) — always the broadcast side.
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(
        n("n_name").as("resource_site"),
        lit("customer").as("resource_class"),
        c("c_mktsegment").as("resource_subclass"),
        when(c("c_acctbal") < 0, lit("delinquent"))
          .otherwise(lit("standard")).as("resource_type"),
        c("c_name").as("resource_id"),
        concat(c("c_name"), lit(".example.com")).as("resource_endpoint"),
        lit("tpch_discovery").as("resource_plugin"),
        (c("c_custkey").cast("double") + lit(1.5e9)).as("resource_creation_timestamp"),
        map(
          lit("mktsegment"), c("c_mktsegment"),
          lit("nation"), n("n_name"),
          lit("acctbal_bucket"),
          when(c("c_acctbal") < 0, lit("negative"))
            .when(c("c_acctbal") < 5000, lit("low"))
            .otherwise(lit("high"))
        ).as("resource_metadata"))
  }

  /** The SQL (DuckDB) equivalent of [[resources]], used as a CTE prefix in
    * oracle queries. Keep in lock-step with the Scala above. */
  val resourcesSqlCte: String =
    """resources AS (
      |  SELECT n.n_name AS resource_site,
      |         'customer' AS resource_class,
      |         c.c_mktsegment AS resource_subclass,
      |         CASE WHEN c.c_acctbal < 0 THEN 'delinquent' ELSE 'standard' END AS resource_type,
      |         c.c_name AS resource_id,
      |         c.c_name || '.example.com' AS resource_endpoint,
      |         c.c_mktsegment AS meta_mktsegment,
      |         n.n_name AS meta_nation,
      |         CASE WHEN c.c_acctbal < 0 THEN 'negative'
      |              WHEN c.c_acctbal < 5000 THEN 'low'
      |              ELSE 'high' END AS meta_acctbal_bucket
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |)""".stripMargin
}
