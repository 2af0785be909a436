package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Concrete Kafka source/sink wiring: the reference's topic naming and
  * consumer/producer client configuration, bound to Structured Streaming's
  * kafka connector options.
  *
  * Topic scheme (reference `framework/const.py:112-115`, discovery agent
  * `discovery/discovery_plugin_agent.py:159`): per-site topics named
  * `<site><delimiter><suffix>` with delimiter `-` and suffixes `metrics`
  * (raw), `processed`, and `resources`; a consumer subscribes to the topic
  * for every configured site
  * (`framework/utilities/consumer.py:173-176` makeTopicNamesForAllSites).
  * Client knobs map from the reference consumer's constructor defaults
  * (`consumer.py:187-236`): session timeout 60 s, max poll 500 records,
  * max partition fetch 1 MiB.
  *
  * Usage on a real cluster (the sandbox has no broker — specs cover the
  * option/topic composition, the streaming semantics are covered via
  * MemoryStream replays of the same frames):
  * {{{
  *   val raw = KafkaIO.source(spark, KafkaIO.SourceConfig(
  *     bootstrapServers = "k1:9092,k2:9092",
  *     sites = Seq("dc1", "dc2"),
  *     topicSuffix = KafkaIO.MetricsSuffix,
  *     groupId = "metrics_processing_group"))
  *   val out = Pipelines.pollingToKafka(decode(raw))
  *   KafkaIO.sink(out, KafkaIO.SinkConfig(
  *     bootstrapServers = "k1:9092,k2:9092",
  *     checkpointLocation = "hdfs:///ckpt/polling")).start()
  * }}}
  */
object KafkaIO {

  /** `framework/const.py:112` */
  val MetricsSuffix = "metrics"
  /** `framework/const.py:113` */
  val ProcessedSuffix = "processed"
  /** `discovery/discovery_plugin_agent.py:159` */
  val ResourcesSuffix = "resources"
  /** `framework/const.py:114` */
  val TopicDelimiter = "-"
  /** `framework/const.py:115` — key scheme inside a topic */
  val TopicKeyDelimiter = ":"

  /** `<site>-<suffix>` for one site. */
  def topicName(site: String, suffix: String): String =
    s"$site$TopicDelimiter$suffix"

  /** One topic per configured site (`consumer.py:173-176`). */
  def topicsForSites(sites: Seq[String], suffix: String): Seq[String] =
    sites.map(topicName(_, suffix))

  /** Source-side configuration — defaults mirror the reference consumer's
    * (`consumer.py:187-236`). `startingOffsets = "latest"` matches a group
    * consumer joining fresh; checkpointed restarts resume from the
    * checkpoint regardless.
    *
    * NOTE: the reference's `max_poll_records=500` bounds ONE client poll —
    * it has no Spark equivalent (the connector manages fetches itself) and
    * deliberately does NOT map onto `maxOffsetsPerTrigger`, which caps the
    * WHOLE micro-batch across all topic-partitions: a 500-records-per-60s
    * cap would throttle an entire site fleet to ~8 records/s and build
    * unbounded consumer lag. Leave `maxOffsetsPerTrigger` unset unless you
    * are sizing micro-batches, and size it to trigger interval ×
    * target throughput. */
  final case class SourceConfig(
      bootstrapServers: String,
      sites: Seq[String],
      topicSuffix: String,
      groupId: String,
      clientId: String = "",
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      sessionTimeoutMs: Long = 60000L,
      maxPartitionFetchBytes: Long = 1048576L,
      failOnDataLoss: Boolean = false)

  /** The `readStream.format("kafka")` option map for a config. */
  def sourceOptions(c: SourceConfig): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> c.bootstrapServers,
      "subscribe" -> topicsForSites(c.sites, c.topicSuffix).mkString(","),
      "kafka.group.id" -> c.groupId,
      "startingOffsets" -> c.startingOffsets,
      "kafka.session.timeout.ms" -> c.sessionTimeoutMs.toString,
      "kafka.max.partition.fetch.bytes" -> c.maxPartitionFetchBytes.toString,
      "failOnDataLoss" -> c.failOnDataLoss.toString)
    val client =
      if (c.clientId.nonEmpty) Map("kafka.client.id" -> c.clientId)
      else Map.empty[String, String]
    val bound = c.maxOffsetsPerTrigger
      .map(n => Map("maxOffsetsPerTrigger" -> n.toString))
      .getOrElse(Map.empty)
    base ++ client ++ bound
  }

  /** A live kafka source stream: `key`/`value` binary columns plus topic/
    * partition/offset/timestamp — feed through
    * [[KafkaShaped.decodeValidated]] with the matching schema. */
  def source(spark: SparkSession, c: SourceConfig): DataFrame =
    spark.readStream.format("kafka").options(sourceOptions(c)).load()

  /** Sink-side configuration. `triggerSeconds` is the reference's polling
    * cadence (ST6, `Trigger.ProcessingTime`); None = as-fast-as-possible
    * micro-batches. */
  final case class SinkConfig(
      bootstrapServers: String,
      checkpointLocation: String,
      triggerSeconds: Option[Long] = Some(60L))

  /** The `writeStream.format("kafka")` option map for a config. The TOPIC
    * is deliberately absent: frames from [[KafkaShaped.encodeFanout]]
    * carry a per-row `topic` column (site fan-out), which the kafka sink
    * honors natively. */
  def sinkOptions(c: SinkConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> c.bootstrapServers,
    "checkpointLocation" -> c.checkpointLocation)

  /** Compose the writer for a fan-out frame (`topic`/`key`/`value`
    * columns). Caller `.start()`s it — separated so tests can compose
    * without a broker. */
  def sink(df: DataFrame, c: SinkConfig): DataStreamWriter[Row] = {
    val w = df.writeStream.format("kafka").options(sinkOptions(c))
    c.triggerSeconds match {
      case Some(s) => w.trigger(Trigger.ProcessingTime(s * 1000L))
      case None    => w
    }
  }
}
