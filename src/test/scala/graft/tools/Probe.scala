package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{MetricSample, StreamingRate}

/** Scratch probe — dev only: drives the streaming rate transform through
  * the public API as a standalone app. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[MetricSample]
    val q = StreamingRate(input.toDS(), stateTtl = false)
      .writeStream.format("memory").queryName("probe_rates")
      .outputMode("append").start()
    input.addData(MetricSample("srv1|if|eth0", "bits_in", 0.0, 1000.0, 60))
    q.processAllAvailable()
    input.addData(MetricSample("srv1|if|eth0", "bits_in", 6000.0, 1060.0, 60))
    q.processAllAvailable()
    q.stop()
    println("PROBE_RESULT_BEGIN")
    spark.table("probe_rates").orderBy("ts").show(false)
    println("PROBE_RESULT_END")
    spark.stop()
  }
}
