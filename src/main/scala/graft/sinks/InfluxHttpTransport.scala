package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** Concrete HTTP implementation of [[InfluxSink.Transport]] against the
  * InfluxDB v1 write API — the wire the reference's consumer speaks
  * through the influxdb client (`consumers/influxdb/consumer.py:228-336`:
  * `write_points(..., time_precision='s', protocol='line')`).
  *
  * One POST per batch to `/write?db=<db>&precision=s`, body = the
  * newline-joined line-protocol points. Status mapping feeds
  * [[InfluxSink.write]]'s policy exactly as the reference's exception
  * types do:
  *
  *  - 2xx (the API answers 204 No Content) → [[InfluxSink.Ok]]
  *  - 400 (`InfluxDBClientError e.code == 400`, an unparseable point) →
  *    [[InfluxSink.ClientError]] → the sink retries point-by-point and
  *    drops poison points
  *  - anything else — 5xx, auth failures, connect/read timeouts, refused
  *    connections → [[InfluxSink.TransportError]] → the sink retries the
  *    WHOLE batch and ultimately fails the task for redelivery
  *
  * Serializable so `foreachPartition` closures can ship it to executors;
  * the `HttpClient` itself is rebuilt lazily per JVM (it is not
  * serializable and must not be shared across executor boundaries).
  */
final class InfluxHttpTransport(
    endpoint: String,
    database: String,
    username: Option[String] = None,
    password: Option[String] = None,
    connectTimeout: Duration = Duration.ofSeconds(5),
    requestTimeout: Duration = Duration.ofSeconds(30))
  extends (Seq[String] => InfluxSink.WriteResult) with Serializable {

  private val writeUri: URI = {
    val base = endpoint.stripSuffix("/")
    val db = java.net.URLEncoder.encode(database, "UTF-8")
    URI.create(s"$base/write?db=$db&precision=s")
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(connectTimeout).build()

  private def authHeader: Option[String] = for {
    u <- username; p <- password
  } yield "Basic " + Base64.getEncoder.encodeToString(
    s"$u:$p".getBytes(StandardCharsets.UTF_8))

  /** Connection probe — GET /ping, expecting 204 (`consumer.py:253`:
    * the reference exits if the ping fails at startup). */
  def ping(): Boolean =
    try {
      val req = HttpRequest.newBuilder(
          URI.create(endpoint.stripSuffix("/") + "/ping"))
        .timeout(requestTimeout).GET().build()
      val code = client.send(req,
        HttpResponse.BodyHandlers.discarding()).statusCode()
      code >= 200 && code < 300
    } catch { case _: java.io.IOException => false }

  /** Create the target database if missing — `CREATE DATABASE` is
    * idempotent in the v1 API, so no list-then-create race
    * (`consumer.py:259-267` lists first purely for logging). Returns
    * false on any non-2xx / transport failure; the caller decides whether
    * that is fatal (the reference exits). */
  def ensureDatabase(): Boolean =
    try {
      val q = java.net.URLEncoder.encode(
        "CREATE DATABASE \"" + database.replace("\"", "\\\"") + "\"", "UTF-8")
      val builder = HttpRequest.newBuilder(
          URI.create(endpoint.stripSuffix("/") + "/query?q=" + q))
        .timeout(requestTimeout)
        .POST(HttpRequest.BodyPublishers.noBody())
      authHeader.foreach(builder.header("Authorization", _))
      val code = client.send(builder.build(),
        HttpResponse.BodyHandlers.discarding()).statusCode()
      code >= 200 && code < 300
    } catch { case _: java.io.IOException => false }

  def apply(lines: Seq[String]): InfluxSink.WriteResult = {
    val body = lines.mkString("\n")
    val builder = HttpRequest.newBuilder(writeUri)
      .timeout(requestTimeout)
      .header("Content-Type", "text/plain; charset=utf-8")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    authHeader.foreach(builder.header("Authorization", _))
    try {
      val resp = client.send(builder.build(),
        HttpResponse.BodyHandlers.discarding())
      resp.statusCode() match {
        case ok if ok >= 200 && ok < 300 => InfluxSink.Ok
        case 400                         => InfluxSink.ClientError
        case _                           => InfluxSink.TransportError
      }
    } catch {
      // connect refused / timeout / broken pipe — transport, not poison
      case _: java.io.IOException    => InfluxSink.TransportError
      case _: InterruptedException   =>
        Thread.currentThread().interrupt(); InfluxSink.TransportError
    }
  }
}
