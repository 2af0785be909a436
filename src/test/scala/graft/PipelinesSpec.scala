package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sinks.InfluxSink
import graft.streaming.{MetricSample, Pipelines}

/** The full polling→Kafka→Influx dataflow, end to end: a MemoryStream of
  * counter samples through the stateful rate transform, fan-out encode,
  * decode+validate, line rendering, and the batching sink transport. */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("polling to kafka to influx lines, end to end") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MetricSample]
    val q = Pipelines.pollingToKafka(input.toDS(), stateTtl = false,
      globalTopic = Some("global-processed"))
      .writeStream.format("memory").queryName("wire")
      .outputMode("append").start()
    try {
      input.addData(MetricSample("dc1|r1|if|eth0", "bits_in", 0.0, 1000.0, 60))
      q.processAllAvailable()
      input.addData(MetricSample("dc1|r1|if|eth0", "bits_in", 600.0, 1060.0, 60))
      q.processAllAvailable()
    } finally q.stop()

    val wire = spark.table("wire")
    // fan-out: each sample lands on its site topic AND the global topic,
    // keyed by the full series|metric key
    assert(wire.select("topic").distinct().as[String].collect().toSet ==
      Set("dc1-processed", "global-processed"))
    assert(wire.select("key").distinct().as[String].collect().toSeq ==
      Seq("dc1|r1|if|eth0|bits_in"))

    // consumer side: decode the site-topic records and render lines
    val lines = Pipelines.kafkaToInfluxLines(
      wire.filter($"topic" === "dc1-processed"))
      .as[String].collect().toSet
    // `|` is not in the influx escape class (only , = whitespace)
    assert(lines == Set(
      "bits_in,series=dc1|r1|if|eth0 bits_in__counter=0.0 1000",
      "bits_in,series=dc1|r1|if|eth0 bits_in__counter=600.0,bits_in__gauge=10 1060"))

    // transport: batches flow through InfluxSink with retry policy
    // (collected via accumulator — the foreachPartition closure runs on
    // executors, so driver-side collections would mutate a copy)
    val sent = spark.sparkContext.collectionAccumulator[String]("sent")
    InfluxSink.write(
      Pipelines.kafkaToInfluxLines(wire.filter($"topic" === "dc1-processed")),
      transport = batch => { batch.foreach(sent.add); true }, batchSize = 1)
    assert(sent.value.size() == 2)
  }
}
