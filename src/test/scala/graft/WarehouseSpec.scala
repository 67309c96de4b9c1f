package graft

import graft.operators.{Robust, Temporal, TextDedup}
import org.apache.spark.sql.functions._

/** Hand-computed cases for the round-11 temporal-warehouse and text-search
  * operators (the sf0.01 DuckDB oracle covers the full gates; these pin the
  * operator semantics on inputs small enough to verify by eye).
  */
class WarehouseSpec extends SparkSpec {
  private val session = SparkSpec.session
  import session.implicits._

  private def tsv(s: String) = java.time.LocalDateTime.parse(s)

  // (user, ts, tie, value): u1 has a no-op repeat at 02:00 that SCD2
  // compaction must drop; u2 is a single never-changing key.
  private lazy val changelog = Seq(
    (1L, "2024-01-01T00:00:00", 1L, 10.0),
    (1L, "2024-01-01T01:00:00", 2L, 20.0), // change
    (1L, "2024-01-01T02:00:00", 3L, 20.0), // repeat — compacted away
    (1L, "2024-01-01T03:00:00", 4L, 30.0), // change
    (2L, "2024-01-01T00:30:00", 5L, 5.0)
  ).toDF("user_id", "s", "event_id", "value")
    .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")

  test("scd2 compacts repeats and chains validity intervals") {
    val v = Temporal.scd2(changelog, Seq("user_id"), col("ts"),
        col("event_id"), col("value"))
      .orderBy("user_id", "valid_from")
      .select("user_id", "attr", "valid_from", "valid_to")
      .collect()
    assert(v.length === 4) // the 02:00 repeat is gone
    val u1 = v.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getDouble(1)).toSeq === Seq(10.0, 20.0, 30.0))
    // each version closes exactly when the next opens
    assert(u1(0).get(3) === u1(1).get(2))
    assert(u1(1).get(3) === u1(2).get(2))
    // 20.0 stays valid THROUGH the 02:00 repeat, until the 03:00 change
    assert(u1(1).getAs[java.time.LocalDateTime]("valid_to") ===
      tsv("2024-01-01T03:00:00"))
    assert(u1(2).get(3) == null && v.filter(_.getLong(0) == 2L).head.get(3) == null)
  }

  test("attribution carry is strictly-before and per-user") {
    val e = Seq(
      (1L, "2024-01-01T00:00:00", 1L, "purchase"), // before any touch
      (1L, "2024-01-01T01:00:00", 2L, "click"),
      (1L, "2024-01-01T02:00:00", 3L, "view"),
      (1L, "2024-01-01T03:00:00", 4L, "purchase"), // first=click last=view
      (2L, "2024-01-01T02:30:00", 5L, "purchase")  // other user: untouched
    ).toDF("user_id", "s", "event_id", "event_type")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
      .withColumn("touch",
        when(col("event_type").isin("click", "view"), col("event_type")))
    val out = Temporal.attributionCarry(e, Seq("user_id"), col("ts"),
        col("event_id"), col("touch"))
      .where(col("event_type") === "purchase")
      .orderBy("user_id", "ts")
      .select("first_touch", "last_touch").collect()
    assert(out.map(r => (r.get(0), r.get(1))).toSeq ===
      Seq((null, null), ("click", "view"), (null, null)))
  }

  test("resample forward-fills gaps and leaves leading slots null") {
    val spans = Seq((1L, "2024-01-01T00:00:00", "2024-01-01T04:00:00"))
      .toDF("user_id", "a", "b")
      .select(col("user_id"), col("a").cast("timestamp_ntz").as("start"),
        col("b").cast("timestamp_ntz").as("stop"))
    val obs = Seq((1L, "2024-01-01T01:00:00", 7.0), (1L, "2024-01-01T03:00:00", 9.0))
      .toDF("user_id", "s", "value")
      .withColumn("slot", col("s").cast("timestamp_ntz")).drop("s")
    val out = Temporal.resampleFfill(spans, obs, Seq("user_id"),
        expr("INTERVAL 1 HOUR"))
      .orderBy("slot").select("filled").collect().map(_.get(0))
    // 00:00 empty-before-first, 01:00 obs, 02:00 carried, 03:00 obs, 04:00 carried
    assert(out.toSeq === Seq(null, 7.0, 7.0, 9.0, 9.0))
  }

  test("medianMad: exact odd/even medians, sort-selected") {
    val df = Seq(
      ("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 100.0, 3L),          // odd: med 3
      ("b", 1.0, 4L), ("b", 2.0, 5L), ("b", 4.0, 6L), ("b", 10.0, 7L) // even: med 3
    ).toDF("g", "v", "id")
    val mm = Robust.medianMad(df, Seq("g"), col("v"), col("id"))
      .orderBy("g").collect()
    assert(mm(0).getDouble(1) === 3.0)  // a: med
    assert(mm(0).getDouble(2) === 2.0)  // a: devs {2,0,97} → med 2
    assert(mm(1).getDouble(1) === 3.0)  // b: (2+4)/2
    assert(mm(1).getDouble(2) === 1.5)  // b: devs {2,1,1,7} → (1+2)/2
  }

  test("containmentPairs finds the excerpt, directed small-into-large") {
    val small = "alpha beta gamma delta epsilon zeta"          // 2 shingles
    val big = "prefix words here then " + small + " and a long tail of many other words"
    val other = "completely different content with nothing shared at all here"
    val docs = Seq((1L, big), (2L, small), (3L, other)).toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9, n = 5, maxDf = 50).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 2L && r.getLong(1) === 1L) // small contained in big
    assert(r.getLong(2) === r.getLong(3))              // fully contained
  }

  test("containmentPairs sizes count DISTINCT shingles (repeated grams collapse)") {
    // "x y z w v" repeats: 10 tokens → 6 window positions but only 5
    // distinct 5-grams — the size columns (now computed map-side as
    // size of the distinct gram array, not an aggregate over the
    // exploded rows) must count 5, and the fully-contained excerpt
    // must still report inter == size_a
    val small = "x y z w v x y z w v"
    val big = "p q r s t " + small + " and unrelated trailing words follow"
    val docs = Seq((1L, big), (2L, small)).toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9, n = 5, maxDf = 50).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 2L && r.getLong(1) === 1L)
    assert(r.getLong(3) === 5L)                        // size_a: 5 distinct, not 6
    assert(r.getLong(2) === 5L)                        // fully contained: inter == size_a
  }

  test("containmentPairs df cap drops boilerplate shingles as evidence") {
    // the SAME 5 words open every doc — with maxDf=2 that shingle is
    // boilerplate (df=3 > 2) and must not link otherwise-unrelated docs
    val docs = Seq(
      (1L, "shared legal header text here unique1 unique2 unique3"),
      (2L, "shared legal header text here other4 other5 other6"),
      (3L, "shared legal header text here more7 more8 more9")
    ).toDF("doc_id", "text")
    assert(TextDedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.25, n = 5, maxDf = 2).count() === 0)
    // raising the cap re-admits it
    assert(TextDedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.25, n = 5, maxDf = 3).count() > 0)
  }

  test("streaming hll registers equal the batch sketch across batch splits") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1L to 200L).map(i => (s"t${i % 3}", i))
    val batch = graft.operators.Hll.registers(
        rows.toDF("event_type", "user_id"), Seq("event_type"),
        col("user_id"), m = 64)
      .orderBy("event_type", "bucket").collect()
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = graft.streaming.EventStreams.hllRegisters(
        input.toDS().toDF("event_type", "user_id"), Seq("event_type"),
        col("user_id"), m = 64)
      .writeStream.format("memory").queryName("graft_wh_hll")
      .outputMode("complete").start()
    try {
      val (b1, b2) = rows.splitAt(77)
      Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("graft_wh_hll")
      .orderBy("event_type", "bucket").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming cdcLatest is batch-split invariant and hides deleted keys") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // key 1: upsert then newer upsert; key 2: upsert then newer DELETE
    val rows = Seq((1L, 10L, 1L, 5.0, "U"), (1L, 20L, 2L, 7.0, "U"),
      (2L, 10L, 3L, 9.0, "U"), (2L, 30L, 4L, 0.0, "D"))
    def runSplit(at: Int): Seq[(Long, Double)] = {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, Double, String)]
      val name = s"graft_wh_cdc_$at"
      val q = graft.streaming.EventStreams.cdcLatest(
          input.toDS().toDF("user_id", "us", "tie", "value", "op")
            .withColumn("ts", org.apache.spark.sql.functions
              .timestamp_micros(col("us")).cast("timestamp_ntz")),
          Seq("user_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        val (b1, b2) = rows.splitAt(at)
        Seq(b1, b2).foreach { b =>
          if (b.nonEmpty) { input.addData(b); q.processAllAvailable() }
        }
      } finally q.stop()
      spark.table(name).orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    }
    val expected = Seq((1L, 7.0)) // key 2's newest op is the delete
    (1 to 3).foreach(at => assert(runSplit(at) === expected, s"split at $at"))
  }

  test("gate q209 matches a hand check of its own invariants") {
    val out = run("q209_containment_dedup").collect()
    // every emitted row satisfies the declared predicate set
    out.foreach { r =>
      val (inter, sa, sb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(inter * 2 >= sa && inter <= sa && sa <= sb)
    }
  }

  test("resampleInterp: exact midpoints, edge gaps left unfilled") {
    def ts(s: String) = java.time.LocalDateTime.parse(s)
    // user 1: obs at h0=100 and h4=500 -> h1..h3 get 200/300/400;
    // user 2: a single obs -> nothing interior, user absent
    val spans = Seq(
      (1L, ts("2024-01-01T00:00:00"), ts("2024-01-01T04:00:00")),
      (2L, ts("2024-01-01T00:00:00"), ts("2024-01-01T03:00:00")))
      .toDF("user_id", "start", "stop")
    val obs = Seq((1L, ts("2024-01-01T00:00:00"), 100L),
      (1L, ts("2024-01-01T04:00:00"), 500L),
      (2L, ts("2024-01-01T02:00:00"), 700L))
      .toDF("user_id", "slot", "cents")
    val out = Temporal.resampleInterp(spans, obs, Seq("user_id"),
        expr("INTERVAL 1 HOUR"))
      .orderBy("user_id", "slot").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 1L, 1L))
    assert(out.map(_.getDouble(4)).toSeq === Seq(200.0, 300.0, 400.0))
    assert(out.forall(r => r.getLong(2) === 100L && r.getLong(3) === 500L))
  }
}
