package graft

import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, user, ts_us, type, value) — user 1 has two sessions separated
  // by a > gap pause; user 2 one session; ties on ts broken by event_id.
  private val events = Seq(
    (1L, 1L, 1000L, "view", 1.0),
    (2L, 1L, 2000L, "click", 2.0),
    (3L, 1L, 9000L, "purchase", 3.0), // gap 7000 > 5000 → new session
    (4L, 2L, 1000L, "view", 4.0),
    (5L, 2L, 1000L, "click", 5.0), // same ts as 4 → same session, tie by id
    (6L, 1L, 9500L, "view", 6.0)
  ).toDF("event_id", "user_id", "ts_us", "event_type", "value")

  test("assign starts a new session when the gap exceeds the threshold") {
    val out = Sessionize.assign(events, "user_id", "ts_us", "event_id", 5000L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L,
      6L -> 2L))
  }

  test("stats aggregates per session with exact duration") {
    val st = Sessionize.stats(
      Sessionize.assign(events, "user_id", "ts_us", "event_id", 5000L),
      "user_id", "ts_us", "event_type", "value")
      .select("user_id", "session_seq", "n_events", "duration_us", "n_types",
        "value_sum")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(st == Set(
      (1L, 1L, 2L, 1000L, 2L, 3.0),
      (1L, 2L, 2L, 500L, 2L, 9.0),
      (2L, 1L, 2L, 0L, 2L, 9.0)))
  }

  test("funnel requires strictly increasing step timestamps") {
    val out = Sessionize.funnel(events, "user_id", "ts_us", "event_type",
      Seq("view", "click", "purchase"))
      .select("user_id", "reached", "ts_step1", "ts_step2", "ts_step3")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .toMap
    // user 1: view@1000 → click@2000 → purchase@9000 = full funnel
    assert(out(1L) == ((3L, Some(1000L), Some(2000L), Some(9000L))))
    // user 2: view@1000, click@1000 — click NOT strictly after view → stuck
    assert(out(2L) == ((1L, Some(1000L), None, None)))
  }

  test("funnel ignores events of a later step type before earlier steps") {
    val evs = Seq(
      (1L, 9L, 100L, "purchase", 0.0), // before any view: must not count
      (2L, 9L, 200L, "view", 0.0),
      (3L, 9L, 300L, "purchase", 0.0) // before click: must not count
    ).toDF("event_id", "user_id", "ts_us", "event_type", "value")
    val r = Sessionize.funnel(evs, "user_id", "ts_us", "event_type",
      Seq("view", "click", "purchase")).select("reached").as[Long].head()
    assert(r == 1L)
  }

  test("paths assemble in (ts, tie) order, cap at maxSteps, rank by count") {
    // sessions: u1s1 = view>click, u1s2 = purchase>view, u2s1 = view>click
    // (tie at ts 1000 resolved by event_id: 4 before 5)
    val out = Sessionize.pathsTopK(events, "user_id", "ts_us", "event_id",
      "event_type", gapMicros = 5000L, maxSteps = 5, topN = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("view>click", 2L), ("purchase>view", 1L)))
    // the cap truncates to the session's FIRST steps
    val capped = Sessionize.pathsTopK(events, "user_id", "ts_us", "event_id",
      "event_type", gapMicros = 5000L, maxSteps = 1, topN = 10)
      .as[(String, Long)].collect().toMap
    assert(capped == Map("view" -> 2L, "purchase" -> 1L))
  }
}
