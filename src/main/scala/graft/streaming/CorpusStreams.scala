package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextDedup

/** Streaming corpus operators — the incremental twins of the batch text
  * pipeline. An ingest firehose cannot re-run batch dedup per arrival;
  * near-duplicate detection has to ride the stream.
  */
object CorpusStreams {

  final case class DupPair(a_id: Long, b_id: Long, hamming: Int)

  /** Streaming count-min sketch — the incremental face of
    * [[graft.operators.Cms.counters]]: the SAME portable (row, col, c)
    * counter table maintained over an unbounded token stream. The
    * aggregation state IS the sketch, so state is bounded at depth×width
    * rows however long the stream runs — the canonical bounded-state
    * streaming frequency summary (run in complete output mode: each
    * micro-batch re-emits the full ≤ depth×width-row table, and the final
    * table equals the batch sketch over the same rows bit-for-bit; the
    * q205 gate pins that equality through the q190 DuckDB replay). */
  def cmsCounters(stream: DataFrame, value: org.apache.spark.sql.Column,
                  depth: Int, width: Int): DataFrame =
    graft.operators.Cms.counters(stream, value, depth, width)

  /** Streaming decontamination — the incremental twin of
    * `TextDedup.contaminated`: flag arriving documents that share a
    * word-n-gram with a STATIC benchmark corpus, at ingest time rather
    * than in a nightly batch sweep. The stream side explodes to
    * (id, shingle-hash) rows per micro-batch; the benchmark side is a
    * static frame deduplicated to one row per distinct shingle, so the
    * stream-static equi-join is stateless and Spark broadcasts the (small)
    * benchmark set to every task. The trailing dropDuplicates holds state
    * only for ids it has EMITTED — the quarantine list itself — so state
    * is bounded by contamination mass, not corpus size. On a batch frame
    * the same plan degrades to exactly `TextDedup.contaminated`. */
  def contaminated(stream: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String, n: Int = 5): DataFrame =
    TextDedup.shingleRowsN(stream, idCol, textCol, n)
      .join(TextDedup.shingleRowsN(benchmark, idCol, textCol, n)
        .select(col("s")).distinct(), Seq("s"), "left_semi")
      .select(idCol).dropDuplicates(idCol)

  /** Streaming SHARED-SPAN decontamination — the q284 anchor family at
    * ingest: every k-token window of an arriving document is hashed
    * (TextDedup.anchorRows, a stream-safe single-pass expression) and
    * semi-joined against a STATIC quarantine anchor table
    * (TextDedup.spanAnchorTable over a benchmark set / known-leaked
    * spans), so verbatim k-token-plus overlap is flagged BEFORE the
    * document lands — with evidence: matched-window count and the
    * longest consecutive matched run (= longest verbatim span,
    * run + k − 1 tokens), computed from the matched positions alone
    * (sorted-array fold, no per-pair window), so the whole report is one
    * stream-static equi-join (stateless — Spark broadcasts the anchor
    * table) plus one per-document aggregation whose state is bounded by
    * CONTAMINATION mass, not corpus size. On a batch frame the same plan
    * is the batch sweep the oracle replays; the incremental MemoryStream
    * form (complete mode, same final table) is pinned in StreamingSpec.
    *
    * Output per flagged id: (idCol, n_anchors, max_span_tokens). */
  def spanContaminated(stream: DataFrame, quarantineAnchors: DataFrame,
                       idCol: String, textCol: String, k: Int = 8,
                       minAnchors: Int = 1): DataFrame =
    TextDedup.anchorRows(stream, idCol, textCol, k)
      .join(quarantineAnchors.select(col("h")).distinct(), Seq("h"),
        "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_anchors"),
        collect_list(col("p").cast("long")).as("__ps"))
      .where(col("n_anchors") >= minAnchors)
      .withColumn("max_span_tokens",
        aggregate(array_sort(col("__ps")),
          struct(lit(0L).as("run"), lit(0L).as("best"), lit(-2L).as("prev")),
          (s, p) => {
            val run = when(p === s.getField("prev") + 1,
              s.getField("run") + 1).otherwise(lit(1L))
            struct(run.as("run"),
              greatest(s.getField("best"), run).as("best"),
              p.as("prev"))
          },
          s => s.getField("best") + (k - 1)))
      .drop("__ps")

  /** Sketches silently evicted by the `maxPerBand` capacity cap since the
    * most recent `nearDupPairs` call — nonzero means hot bands are losing
    * recall and `maxPerBand` (or the TTL) needs raising. A per-call
    * accumulator so executor-side drops aggregate correctly on a cluster. */
  @volatile var lastDroppedSketches: Option[org.apache.spark.util.LongAccumulator] = None

  /** Streaming near-duplicate detection: each arriving document is
    * SimHash-banded exactly like the batch path (TextDedup.simhashBands —
    * pigeonhole: any pair within `maxHamming` shares at least one whole
    * block), the band becomes the state key, and flatMapGroupsWithState
    * keeps the sketches seen per band; a new document emits a pair for
    * every stored or same-batch copartner within `maxHamming`. The same
    * pair can surface from several shared bands (the batch path `distinct`s
    * for the same reason) — callers dedup downstream. State per band is a
    * most-recent-`maxPerBand` list: band keys spread uniformly, so state is
    * bounded by nBands × maxPerBand sketches — the knob a 100 TB ingest
    * tunes instead of letting state grow with the corpus. Capacity
    * evictions are COUNTED (`lastDroppedSketches`): silent drops on a hot
    * band are lost recall, and the counter is what makes that visible.
    * Emitted pairs are exactly the batch `simhashPairs` result (spec-pinned)
    * while every band's population fits `maxPerBand`.
    *
    * Optional event-time TTL: pass `tsCol` (an event-time column the caller
    * has put a `withWatermark` on) and `ttlMs` > 0, and a stored sketch only
    * pairs against arrivals within `ttlMs` of event time — after that the
    * entry is evicted on the band's next update, and a band idle past its
    * newest entry's expiry has its WHOLE state removed via an event-time
    * timeout. Without a TTL an infinite stream pins nBands × maxPerBand
    * sketches forever; with one, state shrinks to the live window. TTL
    * evictions are deliberate forgetting, so they do NOT count as dropped. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxPerBand: Int = 4096,
                   tsCol: String = "", ttlMs: Long = 0L): Dataset[DupPair] = {
    require((ttlMs > 0) == tsCol.nonEmpty,
      "event-time TTL needs BOTH tsCol (watermarked by the caller) and ttlMs > 0")
    import docs.sparkSession.implicits._
    val dropped = docs.sparkSession.sparkContext
      .longAccumulator("graft.nearDup.droppedSketches")
    lastDroppedSketches = Some(dropped)
    // the event-time column rides along UN-derived as _5: Spark's streaming
    // checker demands an attribute still carrying the watermark's event-time
    // metadata in the stateful operator's input, and aliases preserve that
    // metadata while derived expressions (unix_millis, casts) strip it — so
    // tsCol must already be a TIMESTAMP column. Constant epoch when no TTL.
    val tsExpr = if (tsCol.isEmpty) lit(new java.sql.Timestamp(0L))
      else col(tsCol)
    val banded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextDedup.simhashOf(col(textCol)).as("sim"), tsExpr.as("ts_ev"))
      .select(col("doc_id"), col("sim"), col("ts_ev"),
        explode(TextDedup.simhashBands(col("sim"), maxHamming)).as("b"))
      .select(col("doc_id"), col("sim"),
        col("b.blk").as("blk"), col("b.bits").as("bits"), col("ts_ev"))
      .as[(Long, Long, Int, Long, java.sql.Timestamp)]
    val timeout = if (ttlMs > 0) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[List[(Long, Long, Long)], DupPair](
        OutputMode.Append(), timeout) {
        case (_, _, state: GroupState[List[(Long, Long, Long)]]) if state.hasTimedOut =>
          // idle band past its newest entry's expiry: drop the whole group
          state.remove()
          Iterator.empty
        case (_, rows, state: GroupState[List[(Long, Long, Long)]]) =>
          val wm = if (ttlMs > 0) state.getCurrentWatermarkMs() else Long.MinValue
          // TTL expiry first (intentional forgetting — not counted as drops)
          var seen = state.getOption.getOrElse(Nil)
            .filter { case (_, _, ts) => ttlMs <= 0 || ts + ttlMs > wm }
          val out = List.newBuilder[DupPair]
          rows.toSeq.sortBy(_._1).foreach { case (id, sim, _, _, ts) =>
            seen.foreach { case (oid, osim, _) =>
              if (oid != id) {
                val h = java.lang.Long.bitCount(sim ^ osim)
                if (h <= maxHamming)
                  out += DupPair(math.min(id, oid), math.max(id, oid), h)
              }
            }
            seen = (id, sim, ts.getTime) :: seen
          }
          if (seen.length > maxPerBand) dropped.add(seen.length - maxPerBand)
          state.update(seen.take(maxPerBand))
          if (ttlMs > 0 && seen.nonEmpty) {
            val newest = seen.map(_._3).max
            // must be strictly past the current watermark or Spark rejects it
            state.setTimeoutTimestamp(math.max(newest + ttlMs, wm + 1))
          }
          out.result().iterator
      }
  }
}
