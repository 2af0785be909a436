package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe — dev only (r18, VERDICT #3): prices the streaming
  * rows' per-query LIFECYCLE (query start → 2 micro-batches → stop)
  * against the marginal cost of the same micro-batches on a LONG-LIVED
  * streaming query, to decide whether a shared streaming session could
  * amortize the ~2 s/row floor of the 19 stream_* bench rows.
  *
  * A: the bench shape — stream_window run end-to-end N times (each run
  *    is a fresh child session + FileReplay lifecycle).
  * B: ONE streaming query over the same transform, fed N successive
  *    (data, sentinel) file pairs — each pair's event times shifted
  *    +90 days past the previous sentinel so the watermark admits them
  *    — timing each pair's turnaround. Pair 1 includes the lifecycle
  *    start; pairs 2..N are the marginal micro-batch cost a long-lived
  *    query would pay per bench row.
  */
object StreamLifecycleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // ---- A: the bench lifecycle, 3 fresh runs ----
    graft.SparkEntry.queries("stream_window")(spark, sfDir).count() // warm
    graft.queries.PipelineQueries.clearCaches()
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("stream_window")(spark, sfDir).count()
      println(f"PROBE lifecycle r$r ${(System.nanoTime() - t0) / 1e9}%5.2f s ($n rows)")
      graft.queries.PipelineQueries.clearCaches()
    }

    // ---- B: one long-lived query, 4 (data, sentinel) pairs ----
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    ss.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    val events = graft.core.Tables.eventsUs(ss, sfDir)
    val maxUs = events.agg(max(col("ts_us"))).head.getLong(0)
    val dir = Files.createTempDirectory("graft_longlived_")
    val schema = ss.read.parquet(s"$sfDir/events.parquet").schema
    // seed batch 0 so the query can start with the real schema flowing
    Files.createSymbolicLink(dir.resolve("seed.parquet"),
      Paths.get(s"$sfDir/events.parquet").toAbsolutePath)
    val stream = ss.readStream.schema(schema).parquet(dir.toString)
    val agg = stream
      .select(graft.core.Tables.tsMicros(stream).as("ts_us"),
        col("event_type"), col("value").cast("double").as("value"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.format("memory").queryName("longlived")
      .outputMode("append").start()
    val t0 = System.nanoTime()
    q.processAllAvailable()
    println(f"PROBE longlived start+batch0 ${(System.nanoTime() - t0) / 1e9}%5.2f s")
    val shift = 90L * 86400000000L // 90 days per pair
    val raw = ss.read.parquet(s"$sfDir/events.parquet")
    val tsIsLong = raw.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    def shiftedTs(base: org.apache.spark.sql.Column, usOffset: Long) =
      if (tsIsLong) base + lit(usOffset * 1000L)
      else timestamp_micros(unix_micros(base.cast("timestamp")) +
        lit(usOffset)).cast(raw.schema("ts").dataType)
    (1 to 4).foreach { i =>
      val t1 = System.nanoTime()
      // data batch: the same raw events shifted past the previous sentinel
      raw.select(raw.columns.map {
          case "ts" => shiftedTs(col("ts"), i * shift).as("ts")
          case c => col(c)
        }: _*)
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      // sentinel batch: flush the pair's windows
      raw.limit(1).select(raw.columns.map {
          case "ts" =>
            (if (tsIsLong)
              lit((maxUs + i * shift + 30L * 86400000000L) * 1000L)
            else timestamp_micros(
              lit(maxUs + i * shift + 30L * 86400000000L))
              .cast(raw.schema("ts").dataType)).as("ts")
          case "event_type" => lit("__wm__").as("event_type")
          case c => col(c)
        }: _*)
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      println(f"PROBE longlived pair$i ${(System.nanoTime() - t1) / 1e9}%5.2f s")
    }
    q.stop()
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(p => Files.deleteIfExists(p))
    spark.stop()
  }
}
