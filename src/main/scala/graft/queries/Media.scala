package graft.queries

import graft.Db
import graft.operators.Multimodal
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline surface.
  *
  * q70 keeps the generic decode STUB (any-format story — see
  * graft.operators.Multimodal.decodeStub). q108/q109 are REAL codecs: the
  * gates synthesize genuine PNG images (JDK ImageIO) and RIFF/WAVE PCM16
  * audio from deterministic per-doc formulas, ship them through binary
  * columns, and decode them for real; the DuckDB oracle recomputes the
  * expected features analytically from the same formulas, so a decode error
  * breaks the exact hash match.
  */
object Media {

  final case class ImagePayload(doc_id: Long, payload: Array[Byte])
  final case class AudioPayload(doc_id: Long, payload: Array[Byte])

  /** v(x, y) = (doc_id·31 + 7x + 13y) mod 256 — the shared pixel formula. */
  /** Spread the id stream before per-row encode/decode: media synthesis
    * and codec work is per-row expensive, and the ids arrive from a
    * single-row-group scan (one task). No-op once the input already
    * carries >= session-parallelism partitions (graft.Db.spread's rule,
    * typed for the Dataset[Long] id stream). */
  private def spreadIds(docs: Dataset[java.lang.Long]): Dataset[java.lang.Long] = {
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    if (Db.scanPartitions(docs.toDF) < p) docs.repartition(p) else docs
  }

  private def synthImages(docs: Dataset[java.lang.Long]): Dataset[ImagePayload] = {
    import docs.sparkSession.implicits._
    spreadIds(docs).mapPartitions(_.map { idBoxed =>
      val id = idBoxed.longValue()
      val w = (8 + id % 9).toInt
      val h = (8 + id % 7).toInt
      ImagePayload(id, Multimodal.encodePngGray(w, h,
        (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt))
    })
  }

  final case class VideoPayload(doc_id: Long, payload: Array[Byte])

  /** frame f pixel: (doc_id·31 + 17f + 7x + 13y) mod 256; 4–9 frames/doc. */
  private def synthVideos(docs: Dataset[java.lang.Long]): Dataset[VideoPayload] = {
    import docs.sparkSession.implicits._
    spreadIds(docs).mapPartitions(_.map { idBoxed =>
      val id = idBoxed.longValue()
      val nFrames = (4 + id % 6).toInt
      val w = (8 + id % 5).toInt
      val h = (8 + id % 3).toInt
      val frames = (0 until nFrames).map { f =>
        Multimodal.encodePngGray(w, h,
          (x, y) => ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt)
      }
      VideoPayload(id, Multimodal.encodeFrames(frames))
    })
  }

  /** s(i) = ((doc_id·13 + 7i) mod 2003) − 1001 at 8 kHz — the sample formula. */
  private def synthAudio(docs: Dataset[java.lang.Long]): Dataset[AudioPayload] = {
    import docs.sparkSession.implicits._
    spreadIds(docs).mapPartitions(_.map { idBoxed =>
      val id = idBoxed.longValue()
      val n = (400 + (id % 5) * 100).toInt
      val samples = Array.tabulate(n)(i => ((id * 13 + i * 7) % 2003 - 1001).toShort)
      AudioPayload(id, Multimodal.encodeWavPcm16(8000, samples))
    })
  }

  val all: Seq[Q] = Seq(
    Q("q70_multimodal_features", Some("""
      SELECT doc_id, 'text/plain' AS media_type,
        CAST(strlen(text) AS INT) AS n_bytes,
        CAST(16 + strlen(text) % 64 AS INT) AS width,
        CAST(16 + (strlen(text) * 7) % 64 AS INT) AS height,
        CAST(1 + strlen(text) % 8 AS INT) AS n_frames,
        (strlen(text) % 1000) / 997.0 AS feature_mean
      FROM documents ORDER BY doc_id"""),
      (s, dir) => Multimodal
        .extractFeatures(Multimodal.mediaFromDocuments(s, Db(s, dir).documents))
        .toDF().orderBy("doc_id")),

    // --- q108: real PNG roundtrip — synthesize → encode (ImageIO) → binary
    //     column → decode (ImageIO) → features; analytic oracle
    Q("q108_image_features", Some("""
      WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
                 FROM documents WHERE doc_id < 200)
      SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
             round(CAST(sum((doc_id*31 + x*7 + y*13) % 256) AS DOUBLE)
                   / count(*), 4) AS mean_luma
      FROM d, LATERAL unnest(range(0, w)) t1(x), LATERAL unnest(range(0, h)) t2(y)
      GROUP BY doc_id ORDER BY doc_id"""),
      (s, dir) => {
        import s.implicits._
        val ids = Db(s, dir).documents.filter(col("doc_id") < 200)
          .select(col("doc_id")).as[java.lang.Long]
        synthImages(ids).mapPartitions(_.map { r =>
          // one ImageIO reader context per partition, rows decoded in a loop
          val (w, h, lumaSum) = Multimodal.imageFeatures(r.payload)
          (r.doc_id, w, h, lumaSum)
        }).toDF("doc_id", "width", "height", "luma_sum")
          .select(col("doc_id"), col("width"), col("height"),
            round(col("luma_sum").cast("double") /
              (col("width") * col("height")), 4).as("mean_luma"))
          .orderBy("doc_id")
      }),

    // --- q112: frame sampling over video-shaped payloads — every 2nd frame
    //     of a length-prefixed PNG frame container is decoded (and ONLY
    //     those); features over the sampled frames, analytic oracle
    Q("q112_frame_sample", Some("""
      WITH d AS (SELECT doc_id, 4 + doc_id % 6 AS nf, 8 + doc_id % 5 AS w,
                        8 + doc_id % 3 AS h
                 FROM documents WHERE doc_id < 200),
      f AS (SELECT doc_id, nf, w, h, fi
            FROM d, LATERAL unnest(range(0, nf)) t(fi) WHERE fi % 2 = 0)
      SELECT doc_id, CAST(max(nf) AS INT) AS n_frames,
             CAST(count(DISTINCT fi) AS INT) AS n_sampled,
             round(CAST(sum((doc_id*31 + fi*17 + x*7 + y*13) % 256) AS DOUBLE)
                   / count(*), 4) AS mean_luma
      FROM f, LATERAL unnest(range(0, w)) t1(x), LATERAL unnest(range(0, h)) t2(y)
      GROUP BY doc_id ORDER BY doc_id"""),
      (s, dir) => {
        import s.implicits._
        val ids = Db(s, dir).documents.filter(col("doc_id") < 200)
          .select(col("doc_id")).as[java.lang.Long]
        synthVideos(ids).mapPartitions(_.map { r =>
          val nFrames = Multimodal.frameCount(r.payload)
          val sampled = Multimodal.sampleFrames(r.payload, every = 2)
          var lumaSum = 0L
          var px = 0L
          sampled.foreach { f =>
            val (w, h, s0) = Multimodal.imageFeatures(f)
            lumaSum += s0; px += w.toLong * h
          }
          (r.doc_id, nFrames, sampled.length, lumaSum, px)
        }).toDF("doc_id", "n_frames", "n_sampled", "luma_sum", "px")
          .select(col("doc_id"), col("n_frames"), col("n_sampled"),
            round(col("luma_sum").cast("double") / col("px"), 4).as("mean_luma"))
          .orderBy("doc_id")
      }),

    // --- q109: real WAV (RIFF PCM16) roundtrip — synthesize → encode →
    //     binary column → chunk-parse → duration/RMS; analytic oracle
    Q("q109_audio_features", Some("""
      WITH d AS (SELECT doc_id, 400 + (doc_id % 5) * 100 AS n
                 FROM documents WHERE doc_id < 200),
      s AS (SELECT doc_id, n, (doc_id*13 + i*7) % 2003 - 1001 AS v
            FROM d, LATERAL unnest(range(0, n)) t(i))
      SELECT doc_id, CAST(max(n) AS INT) AS n_samples,
             round(CAST(max(n) AS DOUBLE) / 8000, 4) AS duration_sec,
             round(sqrt(CAST(sum(v*v) AS DOUBLE) / max(n)), 4) AS rms
      FROM s GROUP BY doc_id ORDER BY doc_id"""),
      (s, dir) => {
        import s.implicits._
        val ids = Db(s, dir).documents.filter(col("doc_id") < 200)
          .select(col("doc_id")).as[java.lang.Long]
        synthAudio(ids).mapPartitions(_.map { r =>
          val (rate, n, sumSq) = Multimodal.wavFeatures(r.payload)
          (r.doc_id, rate, n, sumSq)
        }).toDF("doc_id", "rate", "n_samples", "sum_sq")
          .select(col("doc_id"), col("n_samples"),
            round(col("n_samples").cast("double") / col("rate"), 4).as("duration_sec"),
            round(sqrt(col("sum_sq").cast("double") / col("n_samples")), 4).as("rms"))
          .orderBy("doc_id")
      }),

    // --- q225: perceptual-hash image dedup — 200 real PNGs in 50 base
    //     variants (docs sharing doc_id mod 50 render the same scene;
    //     copies 2–4 perturb ONE pixel, so their PNG BYTES differ and
    //     md5/exact dedup misses them), decoded for real (ImageIO),
    //     aHash'd (Multimodal.aHash64: 8×8 block means vs global mean,
    //     exact integer cross-multiplied threshold) and grouped on the
    //     two 32-bit hash halves — the near-dup image dedup every
    //     multimodal training pipeline runs. The oracle replays pixels,
    //     cell sums, every threshold bit, and the packing analytically.
    //     100 TB: decode+hash is map-only per partition; dedup is one
    //     hash-keyed exact groupBy (q50's shape).
    Q("q225_image_dedup", Some("""
      WITH d AS (SELECT doc_id, doc_id % 50 AS base,
                   8 + (doc_id % 50) % 9 AS w, 8 + (doc_id % 50) % 7 AS h
                 FROM documents WHERE doc_id < 200),
      px AS (SELECT doc_id, w, h,
               ((base*31 + x*7 + y*13 +
                 CASE WHEN x = 0 AND y = 0 THEN doc_id // 50 ELSE 0 END)
                % 256) AS v, x, y
             FROM d, LATERAL unnest(range(0, w)) t1(x),
                  LATERAL unnest(range(0, h)) t2(y)),
      cell AS (SELECT doc_id, least(x * 8 // w, 7) AS cx,
                 least(y * 8 // h, 7) AS cy, sum(v) AS cs, count(*) AS cn
               FROM px GROUP BY 1, 2, 3),
      tot AS (SELECT doc_id, sum(cs) AS gs, sum(cn) AS gn
              FROM cell GROUP BY 1),
      bits AS (SELECT c.doc_id,
                 CASE WHEN c.cs * t.gn > t.gs * c.cn THEN 1 ELSE 0 END AS bit,
                 c.cy * 8 + c.cx AS pos
               FROM cell c JOIN tot t USING (doc_id)),
      h AS (SELECT doc_id,
              CAST(sum(CASE WHEN bit = 1 AND pos < 32
                   THEN CAST(1 AS BIGINT) << CAST(pos AS INT) ELSE 0 END)
                AS BIGINT) AS hash_lo,
              CAST(sum(CASE WHEN bit = 1 AND pos >= 32
                   THEN CAST(1 AS BIGINT) << CAST(pos - 32 AS INT) ELSE 0 END)
                AS BIGINT) AS hash_hi
            FROM bits GROUP BY 1)
      SELECT hash_lo, hash_hi, count(*) AS n_dups, min(doc_id) AS keep_id
      FROM h GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY keep_id"""),
      (s, dir) => {
        import s.implicits._
        val ids = Db(s, dir).documents.filter(col("doc_id") < 200)
          .select(col("doc_id")).as[java.lang.Long]
        val imgs = spreadIds(ids).mapPartitions(_.map { idBoxed =>
          val id = idBoxed.longValue()
          val base = id % 50
          val w = (8 + base % 9).toInt
          val h = (8 + base % 7).toInt
          ImagePayload(id, Multimodal.encodePngGray(w, h, (x, y) =>
            ((base * 31 + x * 7 + y * 13 +
              (if (x == 0 && y == 0) id / 50 else 0L)) % 256).toInt))
        })
        imgs.mapPartitions(_.map { r =>
          val (lo, hi) = Multimodal.aHash64(r.payload)
          (r.doc_id, lo, hi)
        }).toDF("doc_id", "hash_lo", "hash_hi")
          .groupBy("hash_lo", "hash_hi")
          .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
          .where(col("n_dups") > 1)
          .orderBy("keep_id")
      }),

    // --- q226: audio fingerprint dedup — q225's sibling for sound: 200
    //     real WAVs in 50 base variants (copies perturb sample 0, so the
    //     PCM BYTES differ), decoded by the RIFF parser, fingerprinted by
    //     64-sample frame-energy profile (exact integer cross-multiplied
    //     thresholds) and grouped on (n_frames, fingerprint). The oracle
    //     replays samples, frame energies, every bit and the packing.
    Q("q226_audio_dedup", Some("""
      WITH d AS (SELECT doc_id, doc_id % 50 AS base,
                   400 + (doc_id % 50) % 5 * 100 AS n
                 FROM documents WHERE doc_id < 200),
      s AS (SELECT doc_id, n, i // 64 AS f,
              ((base*13 + i*7) % 2003 - 1001 +
               CASE WHEN i = 0 THEN doc_id // 50 ELSE 0 END) AS v
            FROM d, LATERAL unnest(range(0, n)) t(i)),
      fe AS (SELECT doc_id, n, f, sum(v*v) AS e, count(*) AS fs
             FROM s GROUP BY 1, 2, 3),
      tot AS (SELECT doc_id, sum(e) AS te FROM fe GROUP BY 1),
      fp AS (SELECT fe.doc_id, CAST(max(fe.n // 64 + CASE WHEN fe.n % 64 > 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_frames,
               CAST(sum(CASE WHEN fe.e * fe.n > t.te * fe.fs
                    THEN CAST(1 AS BIGINT) << CAST(fe.f AS INT) ELSE 0 END)
                 AS BIGINT) AS fingerprint
             FROM fe JOIN tot t USING (doc_id) GROUP BY 1)
      SELECT n_frames, fingerprint, count(*) AS n_dups, min(doc_id) AS keep_id
      FROM fp GROUP BY 1, 2 HAVING count(*) > 1 ORDER BY keep_id"""),
      (s, dir) => {
        import s.implicits._
        val ids = Db(s, dir).documents.filter(col("doc_id") < 200)
          .select(col("doc_id")).as[java.lang.Long]
        val wavs = spreadIds(ids).mapPartitions(_.map { idBoxed =>
          val id = idBoxed.longValue()
          val base = id % 50
          val n = (400 + base % 5 * 100).toInt
          val samples = Array.tabulate(n)(i =>
            ((base * 13 + i * 7) % 2003 - 1001 +
              (if (i == 0) id / 50 else 0L)).toShort)
          AudioPayload(id, Multimodal.encodeWavPcm16(8000, samples))
        })
        wavs.mapPartitions(_.map { r =>
          val (nf, fp) = Multimodal.audioFingerprint(r.payload, frameLen = 64)
          (r.doc_id, nf.toLong, fp)
        }).toDF("doc_id", "n_frames", "fingerprint")
          .groupBy("n_frames", "fingerprint")
          .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
          .where(col("n_dups") > 1)
          .orderBy("keep_id")
      }),

    // --- q227: video perceptual dedup — the triad's third member: every
    //     frame of the length-prefixed PNG container is decoded and
    //     aHash'd (q225), and the video signature is the ORDER-WEIGHTED
    //     exact-integer sum Σ (f+1)·(hash mod 1e9) over the frame
    //     sequence — frame REORDERING changes the signature, per-frame
    //     pixel perturbation does not (the aHash absorbs it), and a pure
    //     SUM is partition-order-independent with no overflow (≤ 9
    //     frames × 9e9). Copies (same doc_id mod 50) differ in every
    //     frame's PNG bytes yet collide. The oracle replays pixels, every
    //     frame's 64 threshold bits, both packings, and the weighted sums.
    Q("q227_video_dedup", Some("""
      WITH d AS (SELECT doc_id, doc_id % 50 AS base,
                   4 + (doc_id % 50) % 6 AS nf,
                   8 + (doc_id % 50) % 5 AS w, 8 + (doc_id % 50) % 3 AS h
                 FROM documents WHERE doc_id < 200),
      px AS (SELECT doc_id, f, w, h,
               ((base*31 + f*17 + x*7 + y*13 +
                 CASE WHEN x = 0 AND y = 0 THEN doc_id // 50 ELSE 0 END)
                % 256) AS v, x, y
             FROM d, LATERAL unnest(range(0, nf)) t0(f),
                  LATERAL unnest(range(0, w)) t1(x),
                  LATERAL unnest(range(0, h)) t2(y)),
      cell AS (SELECT doc_id, f, least(x * 8 // w, 7) AS cx,
                 least(y * 8 // h, 7) AS cy, sum(v) AS cs, count(*) AS cn
               FROM px GROUP BY 1, 2, 3, 4),
      tot AS (SELECT doc_id, f, sum(cs) AS gs, sum(cn) AS gn
              FROM cell GROUP BY 1, 2),
      bits AS (SELECT c.doc_id, c.f,
                 CASE WHEN c.cs * t.gn > t.gs * c.cn THEN 1 ELSE 0 END AS bit,
                 c.cy * 8 + c.cx AS pos
               FROM cell c JOIN tot t USING (doc_id, f)),
      fh AS (SELECT doc_id, f,
               CAST(sum(CASE WHEN bit = 1 AND pos < 32
                    THEN CAST(1 AS BIGINT) << CAST(pos AS INT) ELSE 0 END)
                 AS BIGINT) AS lo,
               CAST(sum(CASE WHEN bit = 1 AND pos >= 32
                    THEN CAST(1 AS BIGINT) << CAST(pos - 32 AS INT) ELSE 0 END)
                 AS BIGINT) AS hi
             FROM bits GROUP BY 1, 2),
      sig AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
                CAST(sum((f+1) * (lo % 1000000000)) AS BIGINT) AS sig_lo,
                CAST(sum((f+1) * (hi % 1000000000)) AS BIGINT) AS sig_hi
              FROM fh GROUP BY 1)
      SELECT n_frames, sig_lo, sig_hi, count(*) AS n_dups,
             min(doc_id) AS keep_id
      FROM sig GROUP BY 1, 2, 3 HAVING count(*) > 1 ORDER BY keep_id"""),
      (s, dir) => {
        import s.implicits._
        val ids = Db(s, dir).documents.filter(col("doc_id") < 200)
          .select(col("doc_id")).as[java.lang.Long]
        val vids = spreadIds(ids).mapPartitions(_.map { idBoxed =>
          val id = idBoxed.longValue()
          val base = id % 50
          val nf = (4 + base % 6).toInt
          val w = (8 + base % 5).toInt
          val h = (8 + base % 3).toInt
          val frames = (0 until nf).map { f =>
            Multimodal.encodePngGray(w, h, (x, y) =>
              ((base * 31 + f * 17 + x * 7 + y * 13 +
                (if (x == 0 && y == 0) id / 50 else 0L)) % 256).toInt)
          }
          VideoPayload(id, Multimodal.encodeFrames(frames))
        })
        vids.mapPartitions(_.map { r =>
          val frames = Multimodal.sampleFrames(r.payload, every = 1)
          var sigLo = 0L; var sigHi = 0L
          var f = 0
          while (f < frames.length) {
            val (lo, hi) = Multimodal.aHash64(frames(f))
            sigLo += (f + 1).toLong * (lo % 1000000000L)
            sigHi += (f + 1).toLong * (hi % 1000000000L)
            f += 1
          }
          (r.doc_id, frames.length.toLong, sigLo, sigHi)
        }).toDF("doc_id", "n_frames", "sig_lo", "sig_hi")
          .groupBy("n_frames", "sig_lo", "sig_hi")
          .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
          .where(col("n_dups") > 1)
          .orderBy("keep_id")
      })
  )
}
