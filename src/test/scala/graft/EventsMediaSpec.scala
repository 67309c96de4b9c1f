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

  test("as-of join fills the latest at-or-before payload, ties deduped, no nested loop") {
    val session = spark
    import session.implicits._
    val left = Seq(("A", 5L, 100L), ("A", 10L, 101L), ("A", 15L, 102L),
      ("B", 3L, 103L)).toDF("k", "ts", "lid")
    // (A,5) appears twice — max payload (21) must win the tie
    val right = Seq(("A", 5L, 20L), ("A", 5L, 21L), ("A", 12L, 22L))
      .toDF("k", "pts", "pid")
    def runIt(l: org.apache.spark.sql.DataFrame) =
      graft.operators.AsOfJoin.asOf(l, right, Seq("k"), "ts", "pts")
        .collect().map(r => r.getAs[Long]("lid") ->
          Option(r.getAs[java.lang.Long]("pid")).map(_.longValue)).toMap
    val got = runIt(left)
    assert(got == Map(100L -> Some(21L), 101L -> Some(21L),
      102L -> Some(22L), 103L -> None), s"got $got")
    assert(runIt(left.repartition(7)) == got)
    val plan = graft.operators.AsOfJoin
      .asOf(left, right, Seq("k"), "ts", "pts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"as-of join degenerated to an all-pairs plan:\n$plan")
  }

  test("interval join matches boundaries inclusively, once per pair, and guards runaway grids") {
    val session = spark
    import session.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val intervals = Seq(
      ("A", 1L, t("2024-01-01 00:00:00"), t("2024-01-01 00:10:00")),
      ("B", 2L, t("2024-01-01 01:00:00"), t("2024-01-01 01:05:00")))
      .toDF("k", "iid", "st", "en")
    val probes = Seq(
      ("A", 10L, t("2024-01-01 00:05:00")),  // inside
      ("A", 11L, t("2024-01-01 00:10:00")),  // end boundary: inclusive
      ("A", 12L, t("2024-01-01 00:11:00")),  // outside
      ("B", 13L, t("2024-01-01 00:05:00")))  // right key, wrong time
      .toDF("k", "pid", "pts")
    // 60s cells: interval A spans 11 cells — each pair must still
    // emerge exactly once (a probe lands in one cell)
    val pairs = graft.operators.IntervalJoin.containmentJoin(
        intervals, probes, Seq("k"), "st", "en", "pts",
        bucketMicros = 60L * 1000 * 1000)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.sorted.toSeq == Seq((1L, 10L), (1L, 11L)), s"got ${pairs.toSeq}")
    val err = intercept[IllegalArgumentException] {
      graft.operators.IntervalJoin.containmentJoin(
        intervals, probes, Seq("k"), "st", "en", "pts",
        bucketMicros = 60L * 1000 * 1000, maxCellsPerInterval = 5)
    }
    assert(err.getMessage.contains("grid cells"))
    val plan = graft.operators.IntervalJoin.containmentJoin(
        intervals, probes, Seq("k"), "st", "en", "pts",
        bucketMicros = 600L * 1000 * 1000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join degenerated to an all-pairs plan:\n$plan")
  }

  test("aHash64: flat image hashes to zero; gradient splits; perceptual robustness") {
    import graft.operators.Multimodal
    // flat: no cell mean strictly exceeds the global mean → all bits 0
    val flat = Multimodal.encodePngGray(16, 16, (_, _) => 100)
    assert(Multimodal.aHash64(flat) === (0L, 0L))
    // left-half 0, right-half 200: exactly the right 4 cell-columns are set
    val grad = Multimodal.encodePngGray(16, 16,
      (x, _) => if (x < 8) 0 else 200)
    val (lo, hi) = Multimodal.aHash64(grad)
    val expectedRow = 0xF0L // cx in 4..7 of each cy row
    val expLo = (0 until 4).map(cy => expectedRow << (cy * 8)).reduce(_ | _)
    assert(lo === expLo && hi === expLo)
    // a one-pixel perturbation changes the PNG BYTES but not the aHash —
    // the case exact byte-level dedup misses and perceptual dedup catches
    val base = Multimodal.encodePngGray(12, 10,
      (x, y) => ((x * 7 + y * 13) % 256))
    val nearDup = Multimodal.encodePngGray(12, 10,
      (x, y) => (((x * 7 + y * 13) % 256) + (if (x == 0 && y == 0) 3 else 0)) % 256)
    assert(!java.util.Arrays.equals(base, nearDup))
    assert(Multimodal.aHash64(base) === Multimodal.aHash64(nearDup))
  }

  test("audioFingerprint: flat clip is zero; a loud frame sets exactly its bit") {
    import graft.operators.Multimodal
    val flat = Multimodal.encodeWavPcm16(8000, Array.fill[Short](256)(100))
    assert(Multimodal.audioFingerprint(flat, frameLen = 64) === (4, 0L))
    // frame 2 (samples 128..191) is 10x louder → only bit 2 set
    val spike = Multimodal.encodeWavPcm16(8000,
      Array.tabulate[Short](256)(i => if (i >= 128 && i < 192) 1000 else 100))
    assert(Multimodal.audioFingerprint(spike, frameLen = 64) === (4, 4L))
    // a one-sample perturbation changes the WAV bytes but not the profile
    val a = Multimodal.encodeWavPcm16(8000,
      Array.tabulate[Short](300)(i => ((i * 7) % 2003 - 1001).toShort))
    val b = Multimodal.encodeWavPcm16(8000,
      Array.tabulate[Short](300)(i =>
        (((i * 7) % 2003 - 1001) + (if (i == 0) 2 else 0)).toShort))
    assert(!java.util.Arrays.equals(a, b))
    assert(Multimodal.audioFingerprint(a, 64) === Multimodal.audioFingerprint(b, 64))
  }

  test("wav chunk walk honors RIFF word alignment past odd-length chunks") {
    import graft.operators.Multimodal
    val samples = Array.tabulate[Short](64)(i => (i * 31 - 500).toShort)
    val plain = Multimodal.encodeWavPcm16(8000, samples)
    // splice an odd-length (3-byte) metadata chunk + its pad byte right
    // after the WAVE tag: real-world LIST/INFO chunks land here, and a
    // walker that skips exactly `len` bytes desynchronizes on the pad
    val buf = java.nio.ByteBuffer.allocate(plain.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(plain, 0, 12)                       // RIFF <size> WAVE
    buf.put("JUNK".getBytes("US-ASCII")).putInt(3)
    buf.put(Array[Byte](1, 2, 3, 0))            // 3 bytes + 1 pad
    buf.put(plain, 12, plain.length - 12)       // fmt + data
    val padded = buf.array()
    assert(Multimodal.wavSamples(padded).toSeq === samples.toSeq)
    assert(Multimodal.wavFeatures(padded) === Multimodal.wavFeatures(plain))
  }

  test("video signature: frame reordering changes it, per-frame perturbation does not") {
    import graft.operators.Multimodal
    // seed scales the x-gradient (a mere constant brightness shift would
    // leave the aHash unchanged — block means are shift-invariant, which
    // is the robustness property, not a test bug)
    def frame(seed: Int, bump: Int) = Multimodal.encodePngGray(10, 9,
      (x, y) => ((x * 7 * seed + y * 13 +
        (if (x == 0 && y == 0) bump else 0)) % 256))
    def sig(frames: Seq[Array[Byte]]): (Long, Long) =
      frames.zipWithIndex.map { case (fr, f) =>
        val (lo, hi) = Multimodal.aHash64(fr)
        ((f + 1) * (lo % 1000000000L), (f + 1) * (hi % 1000000000L))
      }.reduce((p, q) => (p._1 + q._1, p._2 + q._2))
    val orig = Seq(frame(1, 0), frame(2, 0), frame(3, 0))
    val perturbed = Seq(frame(1, 3), frame(2, 3), frame(3, 3))
    val reordered = Seq(frame(2, 0), frame(1, 0), frame(3, 0))
    // precondition for the reorder claim: the swapped frames hash apart
    assert(Multimodal.aHash64(frame(1, 0)) !== Multimodal.aHash64(frame(2, 0)))
    assert(sig(orig) === sig(perturbed))   // bytes differ, signature holds
    assert(sig(orig) !== sig(reordered))   // order is part of the identity
  }
}
