package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{KafkaShaped, MetricSample, RateGuards, StreamingRate}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming rate carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MetricSample]
    val q = StreamingRate(input.toDS(), stateTtl = false)
      .writeStream.format("memory").queryName("rates")
      .outputMode("append").start()
    try {
      // batch 1: first samples → no rate
      input.addData(
        MetricSample("s1", "bits_in", 0.0, 1000.0, 60),
        MetricSample("s2", "bits_in", 100.0, 1000.0, 60))
      q.processAllAvailable()
      // batch 2: Δt=60 → rates; s2 resets
      input.addData(
        MetricSample("s1", "bits_in", 120.0, 1060.0, 60),
        MetricSample("s2", "bits_in", 40.0, 1060.0, 60))
      q.processAllAvailable()

      val out = spark.table("rates")
        .select("series", "ts", "rate")
        .as[(String, Double, Option[Long])].collect().toSet
      assert(out == Set(
        ("s1", 1000.0, None), ("s2", 1000.0, None),
        ("s1", 1060.0, Some(2L)),   // (120-0)/60
        ("s2", 1060.0, None)))      // counter reset
    } finally q.stop()
  }

  test("multiple samples within one micro-batch process in ts order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MetricSample]
    val q = StreamingRate(input.toDS(), stateTtl = false)
      .writeStream.format("memory").queryName("rates2")
      .outputMode("append").start()
    try {
      input.addData(
        MetricSample("s", "m", 180.0, 1120.0, 60), // arrives "late" in batch
        MetricSample("s", "m", 0.0, 1000.0, 60),
        MetricSample("s", "m", 60.0, 1060.0, 60))
      q.processAllAvailable()
      val rates = spark.table("rates2").orderBy("ts")
        .select("rate").as[Option[Long]].collect().toSeq
      assert(rates == Seq(None, Some(1L), Some(2L)))
    } finally q.stop()
  }

  // NOTE: no test drives stateTtl=true under the default trigger — with
  // ProcessingTimeTimeout Spark re-triggers micro-batches continuously to
  // fire timeouts, so a processAllAvailable-based test livelocks; the
  // production pairing is Trigger.ProcessingTime (see StreamingRate docs).

  test("guards agree between batch-Column and streaming-Scala forms") {
    // same cases as the golden 8-step spec, via the shared pure function
    assert(RateGuards.compute(None, 0.0, 1000.0, 60) == (None, None))
    assert(RateGuards.compute(Some((0.0, 1000.0)), 60.0, 1060.0, 60) ==
      (Some(1L), Some(1.0)))
    assert(RateGuards.compute(Some((130.0, 1120.0)), 130.0, 1100.0, 60) ==
      (None, None)) // Δt < 0
    assert(RateGuards.compute(Some((140.0, 1100.0)), 150.0, 1100.0, 60) ==
      (None, None)) // Δt = 0
    assert(RateGuards.compute(Some((140.0, 1100.0)), 1000.0, 1400.0, 60) ==
      (None, Some(0.2))) // TTL
    assert(RateGuards.compute(Some((1200.0, 1550.0)), 100.0, 1660.0, 60) ==
      (None, Some(0.55))) // reset
  }

  test("kafka fan-out encode: per-site topic + global topic, series key") {
    val df = Seq(("dc1", "r1|int|if|eth0", 42.0), ("dc2", "r2|int|if|eth1", 7.0))
      .toDF("site", "series", "v")
    val out = KafkaShaped.encodeFanout(df, col("site"), "processed",
      col("series"), struct(col("v")), globalTopic = Some("global-metrics"))
      .as[(String, String, String)].collect().toSet
    assert(out == Set(
      ("dc1-processed", "r1|int|if|eth0", """{"v":42.0}"""),
      ("global-metrics", "r1|int|if|eth0", """{"v":42.0}"""),
      ("dc2-processed", "r2|int|if|eth1", """{"v":7.0}"""),
      ("global-metrics", "r2|int|if|eth1", """{"v":7.0}""")))
  }

  test("decode + validate drops unparseable and key-filtered records") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val df = Seq(
      ("k1", """{"a": 1, "b": "x"}"""),
      ("k1", """not json"""),
      ("k2", """{"a": 2, "b": "y"}""")) // filtered by key
      .toDF("key", "value")
    val out = KafkaShaped.decodeAndValidate(df, schema, allowedKeys = Seq("k1"))
    assert(out.columns.toSeq == Seq("key", "a", "b"))
    assert(out.as[(String, Long, String)].collect().toSet ==
      Set(("k1", 1L, "x")))
  }

  test("invalid records land in the dead-letter frame, exactly partitioned") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val df = Seq(
      ("k1", """{"a": 1, "b": "x"}"""),
      ("k1", """not json"""),
      ("k2", """{"a": 2, "b": "y"}"""),                 // filtered by key
      (null.asInstanceOf[String], """{"a": 3, "b": "z"}""")) // null key
      .toDF("key", "value")
    val valid = KafkaShaped.decodeAndValidate(df, schema, Seq("k1"))
    val dead = KafkaShaped.invalidRecords(df, schema, Seq("k1"))
    // exact partition, including the null-key record (None ∉ keys in the
    // reference → key-filtered, NOT lost to three-valued logic)
    assert(valid.count() + dead.count() == 4)
    assert(dead.select("key", "dropped_by_key_filter")
      .as[(Option[String], Boolean)].collect().toSet ==
      Set((Some("k1"), false), (Some("k2"), true), (None, true)))
  }

  test("decodeValidated drop counts surface per micro-batch on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val schema = StructType(Seq(
      StructField("metric_name", StringType),
      StructField("metric_value", DoubleType)))
    val input = MemoryStream[(String, String)]
    val decoded = KafkaShaped.decodeValidated(
      input.toDS().toDF("key", "value"), schema,
      requiredFields = Seq("metric_name", "metric_value"),
      observationName = "decode_obs")
    val q = decoded.writeStream.format("memory")
      .queryName("decode_obs_out").outputMode("append").start()
    try {
      input.addData(
        ("1", """{"metric_name":"a","metric_value":1.5}"""),
        ("1", """{"metric_name":"b","metric_value":"wrong-type"}"""),
        ("1", """{corrupt"""))
      q.processAllAvailable()
      // observed metrics ride the StreamingQueryProgress of the batch
      val obs = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("decode_obs"))).last
      assert(obs.getAs[Long]("dropped_corrupt") == 1)
      assert(obs.getAs[Long]("dropped_schema") == 1)
      assert(obs.getAs[Long]("passed") == 1)
      assert(spark.table("decode_obs_out").count() == 1)
    } finally q.stop()
  }

  test("required-field enforcement drops null-field rows") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val df = Seq(("k", """{"a": 1}"""), ("k", """{"a": 2, "b": "ok"}"""))
      .toDF("key", "value")
    val out = KafkaShaped.enforceRequired(
      KafkaShaped.decodeAndValidate(df, schema), Seq("b"))
    assert(out.as[(String, Long, String)].collect().toSeq ==
      Seq(("k", 2L, "ok")))
  }
}
