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

  /** Streaming near-duplicate detection: each arriving document is
    * SimHash-banded exactly like the batch path (TextDedup.simhashBands —
    * pigeonhole: any pair within `maxHamming` shares at least one whole
    * block), the band becomes the state key, and flatMapGroupsWithState
    * keeps the sketches seen per band; a new document emits a pair for
    * every stored or same-batch copartner within `maxHamming`. The same
    * pair can surface from several shared bands (the batch path `distinct`s
    * for the same reason) — callers dedup downstream. State per band is a
    * most-recent-`maxPerBand` list: band keys spread uniformly, so state is
    * bounded by nBands × maxPerBand sketches, 16 bytes each — the knob a
    * 100 TB ingest tunes instead of letting state grow with the corpus.
    * Emitted pairs are exactly the batch `simhashPairs` result (spec-pinned)
    * while every band's population fits `maxPerBand`. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxPerBand: Int = 4096): Dataset[DupPair] = {
    import docs.sparkSession.implicits._
    val banded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextDedup.simhashOf(col(textCol)).as("sim"))
      .select(col("doc_id"), col("sim"),
        explode(TextDedup.simhashBands(col("sim"), maxHamming)).as("b"))
      .select(col("doc_id"), col("sim"),
        col("b.blk").as("blk"), col("b.bits").as("bits"))
      .as[(Long, Long, Int, Long)]
    banded.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[List[(Long, Long)], DupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[List[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[DupPair]
          rows.toSeq.sortBy(_._1).foreach { case (id, sim, _, _) =>
            seen.foreach { case (oid, osim) =>
              if (oid != id) {
                val h = java.lang.Long.bitCount(sim ^ osim)
                if (h <= maxHamming)
                  out += DupPair(math.min(id, oid), math.max(id, oid), h)
              }
            }
            seen = (id, sim) :: seen
          }
          state.update(seen.take(maxPerBand))
          out.result().iterator
      }
  }
}
