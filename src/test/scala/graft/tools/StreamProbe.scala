package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch perf probe — dev only: times one streaming replay query at
  * several state-store partition counts to see where the micro-batch
  * floor comes from. */
object StreamProbe {
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

    // warm the parquet + streaming machinery once
    graft.SparkEntry.queries("stream_window")(spark, sfDir).count()
    Seq("stream_window", "stream_join").foreach { q =>
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
        println(f"PROBE $q%-14s r$r ${(System.nanoTime() - t0) / 1e9}%5.2f s ($n rows)")
      }
    }

    // partition-count sensitivity: state stores/commit files scale with
    // the shuffle partition count of the child session
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    Seq(1, 4).foreach { parts =>
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", parts.toString)
        implicit val sqlCtx = ss.sqlContext
        import ss.implicits._
        import org.apache.spark.sql.functions._
        import scala.jdk.CollectionConverters._
        val rows = graft.core.Tables.eventsUs(ss, sfDir)
          .select(col("ts_us"), col("event_type"),
            col("value").cast("double").as("value"))
          .orderBy("ts_us").as[(Long, String, Double)]
        val input = MemoryStream[(Long, String, Double)]
        var maxTs = Long.MinValue
        rows.toLocalIterator().asScala.grouped(8192).foreach { chunk =>
          maxTs = math.max(maxTs, chunk.iterator.map(_._1).max)
          input.addData(chunk)
        }
        val agg = input.toDS().toDF("ts_us", "event_type", "value")
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "6 hours"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
        val qn = s"probe_w_${parts}_$r"
        val q = agg.writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        q.processAllAvailable()
        input.addData(Seq((maxTs + 30L * 86400000000L, "__wm__", 0.0)))
        q.processAllAvailable()
        q.stop()
        val n = ss.table(qn).count()
        println(f"PROBE parts=$parts%-2d       r$r ${(System.nanoTime() - t0) / 1e9}%5.2f s ($n rows)")
      }
    }

    // how much of that is just the driver-side replay feed?
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val rows = graft.core.Tables.eventsUs(spark, sfDir)
        .select(col("ts_us"), col("event_type"),
          col("value").cast("double").as("value"))
        .orderBy("ts_us")
        .as[(Long, String, Double)]
      var cnt = 0L
      rows.toLocalIterator().asScala.grouped(8192)
        .foreach(chunk => cnt += chunk.size)
      println(f"PROBE feed_only      r$r ${(System.nanoTime() - t0) / 1e9}%5.2f s ($cnt rows)")
    }
    spark.stop()
  }
}
