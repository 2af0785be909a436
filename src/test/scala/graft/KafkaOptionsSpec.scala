package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.KafkaIO

/** Guards the kafka connector option maps. The sandbox has no broker (and
  * no spark-sql-kafka jar), so [[KafkaIO]] options are composed but never
  * executed by the connector in tests — a typo'd option key would
  * otherwise hide until a real deployment, where the connector silently
  * ignores unknown options. This spec pins every emitted key against the
  * connector's documented accepted set (Structured Streaming Kafka
  * Integration Guide) and every `kafka.`-prefixed passthrough against the
  * Kafka client's own config names. */
class KafkaOptionsSpec extends AnyFunSuite {

  /** Connector-level options (case-insensitive in the connector; we emit
    * the documented camelCase spellings and compare case-insensitively). */
  private val connectorSourceOptions = Set(
    "subscribe", "subscribepattern", "assign",
    "startingoffsets", "startingoffsetsbytimestamp",
    "startingtimestamp", "startingoffsetsbytimestampstrategy",
    "endingoffsets", "endingoffsetsbytimestamp", "endingtimestamp",
    "failondataloss", "maxoffsetspertrigger", "minoffsetspertrigger",
    "maxtriggerdelay", "minpartitions", "groupidprefix",
    "includeheaders", "kafkaconsumer.polltimeoutms",
    "fetchoffset.numretries", "fetchoffset.retryintervalms")

  private val connectorSinkOptions = Set(
    "topic", "includeheaders", "checkpointlocation")

  /** Kafka client configs the reference consumer/producer sets
    * (`framework/utilities/consumer.py:187-236`) — the passthrough names
    * after the connector strips the `kafka.` prefix. */
  private val kafkaClientConfigs = Set(
    "bootstrap.servers", "group.id", "client.id", "session.timeout.ms",
    "max.partition.fetch.bytes", "request.timeout.ms", "retries",
    "max.poll.records", "heartbeat.interval.ms")

  private def assertKnown(opts: Map[String, String],
                          connectorSet: Set[String]): Unit =
    opts.keys.foreach { k =>
      if (k.startsWith("kafka.")) {
        val client = k.stripPrefix("kafka.")
        assert(kafkaClientConfigs.contains(client),
          s"unknown kafka client config: $k")
      } else {
        assert(connectorSet.contains(k.toLowerCase),
          s"unknown connector option: $k")
      }
    }

  private val srcCfg = KafkaIO.SourceConfig(
    bootstrapServers = "k1:9092,k2:9092",
    sites = Seq("dc1", "dc2"),
    topicSuffix = KafkaIO.MetricsSuffix,
    groupId = "metrics_processing_group",
    clientId = "consumer-1",
    maxOffsetsPerTrigger = Some(100000L))

  test("every source option key is accepted by the connector or client") {
    assertKnown(KafkaIO.sourceOptions(srcCfg), connectorSourceOptions)
  }

  test("source options carry the full reference consumer config") {
    val opts = KafkaIO.sourceOptions(srcCfg)
    assert(opts("kafka.bootstrap.servers") == "k1:9092,k2:9092")
    assert(opts("subscribe") == "dc1-metrics,dc2-metrics")
    assert(opts("kafka.group.id") == "metrics_processing_group")
    assert(opts("kafka.client.id") == "consumer-1")
    assert(opts("kafka.session.timeout.ms") == "60000")
    assert(opts("kafka.max.partition.fetch.bytes") == "1048576")
    assert(opts("startingOffsets") == "latest")
    assert(opts("failOnDataLoss") == "false")
    assert(opts("maxOffsetsPerTrigger") == "100000")
    // nothing extra sneaks in beyond the asserted set
    assert(opts.size == 9, opts.keys.toSeq.sorted.mkString(","))
  }

  test("optional keys are omitted, not emitted empty") {
    val opts = KafkaIO.sourceOptions(srcCfg.copy(
      clientId = "", maxOffsetsPerTrigger = None))
    assert(!opts.contains("kafka.client.id"))
    assert(!opts.contains("maxOffsetsPerTrigger"))
  }

  test("every sink option key is accepted by the connector or client") {
    val opts = KafkaIO.sinkOptions(KafkaIO.SinkConfig(
      bootstrapServers = "k1:9092", checkpointLocation = "/ckpt/p"))
    assertKnown(opts, connectorSinkOptions)
    // per-row `topic` column drives fan-out — a global topic option would
    // silently override it on some connector versions; must stay absent
    assert(!opts.contains("topic"))
  }
}
