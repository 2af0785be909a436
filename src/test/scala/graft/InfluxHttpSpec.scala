package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, atomic}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.sinks.{InfluxHttpTransport, InfluxSink}

object InfluxHttpSpec {
  /** JVM-static request log — the transport runs inside executor tasks in
    * local mode, so driver-side vals would only see a serialized copy. */
  val bodies = new ConcurrentLinkedQueue[String]()
  val queries = new ConcurrentLinkedQueue[String]()
  val auth = new ConcurrentLinkedQueue[String]()
  /** Status script: each request shifts the next code; empty → 204. */
  val script = new ConcurrentLinkedQueue[Integer]()
  val calls = new atomic.AtomicInteger(0)

  def reset(codes: Int*): Unit = {
    bodies.clear(); queries.clear(); auth.clear(); script.clear()
    calls.set(0)
    codes.foreach(c => script.add(c))
  }
}

/** Drives the REAL HTTP transport — an in-process stub server answering the
  * InfluxDB v1 write API — through the reference's three response classes:
  * accepted (204), unparseable point (400 → point-by-point poison drop),
  * and server failure (500 → whole-batch retry, task failure). */
class InfluxHttpSpec extends SparkSpec with BeforeAndAfterAll {
  import InfluxHttpSpec._
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/write", (ex: HttpExchange) => {
      calls.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      bodies.add(body)
      queries.add(Option(ex.getRequestURI.getQuery).getOrElse(""))
      auth.add(Option(ex.getRequestHeaders.getFirst("Authorization"))
        .getOrElse(""))
      val code = Option(script.poll()).map(_.intValue).getOrElse(204)
      // poison-point stub: a 400-scripted server that accepts single
      // points unless the point itself is marked poison
      val status =
        if (code == 400 && !body.contains("\n") && !body.startsWith("poison"))
          204
        else code
      ex.sendResponseHeaders(status, -1)
      ex.close()
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def transport(user: Option[String] = None,
                        pass: Option[String] = None) =
    new InfluxHttpTransport(s"http://127.0.0.1:$port", "panoptes",
      username = user, password = pass)

  test("batch write posts newline-joined lines to /write?db=...&precision=s") {
    reset()
    val lines = Seq("m,t=a v=1 1", "m,t=b v=2 2").toDF("line")
    InfluxSink.write(lines.coalesce(1), transport(), batchSize = 10)
    assert(bodies.size == 1)
    assert(bodies.peek() == "m,t=a v=1 1\nm,t=b v=2 2")
    assert(queries.peek() == "db=panoptes&precision=s")
  }

  test("basic auth header rides when credentials are configured") {
    reset()
    val lines = Seq("m v=1 1").toDF("line")
    InfluxSink.write(lines.coalesce(1),
      transport(Some("panoptes"), Some("s3cret")), batchSize = 10)
    val expect = "Basic " + java.util.Base64.getEncoder.encodeToString(
      "panoptes:s3cret".getBytes(StandardCharsets.UTF_8))
    assert(auth.peek() == expect)
  }

  test("400 on the batch → point-by-point, poison dropped, rest delivered") {
    reset(400) // first (batch) request rejected; singles then hit the
               // poison-aware stub path
    val lines = Seq("good_a v=1 1", "poison v=x 2", "good_b v=3 3")
      .toDF("line")
    InfluxSink.write(lines.coalesce(1), transport(), batchSize = 10)
    // 1 batch POST + 3 single-point POSTs
    assert(calls.get == 4)
    val singles = bodies.toArray(Array.empty[String]).filterNot(_.contains("\n"))
    assert(singles.toSet == Set("good_a v=1 1", "poison v=x 2", "good_b v=3 3"))
  }

  test("500s retry the whole batch then fail the task for redelivery") {
    reset(500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500)
    val lines = Seq("a v=1 1", "b v=2 2").toDF("line")
    val ex = intercept[org.apache.spark.SparkException] {
      InfluxSink.write(lines.coalesce(1), transport(),
        batchSize = 10, maxRetries = 3)
    }
    // whole-batch retries only — never point-by-point against a down server
    assert(calls.get > 0 && calls.get % 3 == 0)
    assert(bodies.toArray(Array.empty[String]).forall(_.contains("\n")))
    assert(ex.getMessage.contains("influx write failed") ||
      Option(ex.getCause).exists(_.getMessage.contains("influx write failed")))
  }

  test("ping and idempotent database creation (startup init)") {
    reset()
    server.createContext("/ping", (ex: HttpExchange) => {
      ex.sendResponseHeaders(204, -1); ex.close()
    })
    server.createContext("/query", (ex: HttpExchange) => {
      queries.add(Option(ex.getRequestURI.getQuery).getOrElse(""))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    val t = transport()
    assert(t.ping())
    assert(t.ensureDatabase())
    // getQuery decodes %22 but leaves the + form-encoding intact
    assert(queries.peek() == "q=CREATE+DATABASE+\"panoptes\"")
    val dead = new InfluxHttpTransport("http://127.0.0.1:1", "panoptes")
    assert(!dead.ping() && !dead.ensureDatabase())
  }

  test("connection refused maps to TransportError, not poison fallback") {
    // a port with nothing listening — transport must classify the IOException
    val dead = new InfluxHttpTransport("http://127.0.0.1:1", "panoptes")
    assert(dead(Seq("m v=1 1")) == InfluxSink.TransportError)
  }
}
