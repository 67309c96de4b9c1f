package graft

import graft.operators.{MediaRecord, Multimodal}

class EventsMediaSpec extends SparkSpec {

  test("sessionization covers every event exactly once") {
    val rows = run("q43_events_sessions").collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == Db(spark, sf).events.count())
    rows.foreach { r =>
      assert(!r.getAs[java.time.LocalDateTime]("session_start")
        .isAfter(r.getAs[java.time.LocalDateTime]("session_end")))
    }
  }

  test("hourly event aggregation counts every event") {
    val rows = run("q40_events_hourly").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Db(spark, sf).events.count())
  }

  test("multimodal decode stub produces bounded features over binary payloads") {
    val session = spark
    import session.implicits._
    val media = Seq(
      MediaRecord(1L, "image/png", Array[Byte](1, 2, 3, 4, 5)),
      MediaRecord(2L, "audio/wav", Array.fill[Byte](100)(7))).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.map(_.n_bytes).sameElements(Array(5, 100)))
    feats.foreach { f =>
      assert(f.width >= 16 && f.width < 80)
      assert(f.height >= 16 && f.height < 80)
      assert(f.n_frames >= 1 && f.n_frames <= 8)
    }
  }

  test("multimodal pipeline output matches document byte lengths") {
    val rows = run("q70_multimodal_features").collect()
    val byId = Db(spark, sf).documents.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").getBytes("UTF-8").length).toMap
    rows.foreach(r => assert(r.getAs[Int]("n_bytes") == byId(r.getAs[Long]("doc_id"))))
  }
}
