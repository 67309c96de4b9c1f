package graft

import org.apache.spark.sql.functions._

/** Session-window semantics pinned empirically — the q195 oracle replays
  * exactly these rules in SQL, so they must not drift. */
class SessionWindowSpec extends SparkSpec {

  private def mk(rows: Seq[(Long, Long, Long)]) = {
    val session = spark
    import session.implicits._
    rows.toDF("user_id", "us", "cents")
      .select(col("user_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("cents"))
  }

  private val MIN = 60L * 1000000

  test("an event exactly gap after the previous one MERGES (touching windows)") {
    val out = streaming.EventStreams.userSessions(mk(Seq(
      (1L, 0L, 1L), (1L, 30 * MIN, 2L)))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_events") == 2)
    assert(out.head.getAs[Long]("cents") == 3)
    // session end = last event + gap
    assert(out.head.getAs[java.time.LocalDateTime]("session_end")
      == java.time.LocalDateTime.of(1970, 1, 1, 1, 0))
  }

  test("an event past the gap starts a new session; users are independent") {
    val out = streaming.EventStreams.userSessions(mk(Seq(
      (1L, 0L, 1L), (1L, 30 * MIN + 1, 2L), // 1 µs past the gap → split
      (2L, 0L, 5L)))).collect()
    assert(out.count(_.getAs[Long]("user_id") == 1L) == 2)
    assert(out.count(_.getAs[Long]("user_id") == 2L) == 1)
  }

  test("q195 gate: sessions are disjoint per user and cents are conserved") {
    val rows = run("q195_stream_sessions").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[java.time.LocalDateTime]("session_start")
        .toString)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.getAs[java.time.LocalDateTime]("session_end")
            .isAfter(b.getAs[java.time.LocalDateTime]("session_start")))
        case _ =>
      }
    }
    // every bounded-slice event lands in exactly one session
    val nTotal = Db(spark, sf).events
      .filter(col("event_id") < 20000).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == nTotal)
  }
}
