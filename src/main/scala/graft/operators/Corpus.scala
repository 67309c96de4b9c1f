package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite corpus-cleaning pipeline: the end-to-end operator a
  * training-data user actually runs — quality scoring → threshold filter →
  * exact dedup (canonical-row election) — composed from the individual
  * operators so every stage stays a declarative, shuffle-keyed plan.
  */
object Corpus {

  /** GPT-2-style BPE pre-tokenization regex, WITHOUT the original's
    * negative lookahead so the Java (Spark) and RE2 (DuckDB) engines
    * segment identically: contractions, optionally-space-prefixed
    * letter runs, digit runs, punctuation runs, residual whitespace
    * runs. Both engines use leftmost-first alternation and Unicode
    * \p{L}/\p{N}, so counts match bit-for-bit on any text without a
    * vertical tab (\x0B is in Java's \s but not RE2's — the one
    * documented divergence; real corpora normalize it upstream). */
  val bpeishPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Exact per-document token statistics — the budget numbers every
    * pretraining mix is planned in: whitespace tokens (\S+ runs — 0 for
    * an empty document, unlike split's [""] quirk) and BPE-ish tokens
    * under [[bpeishPattern]], the cheap proxy for "how many model
    * tokens is this corpus" that runs as a pure map (one regex pass per
    * row, whole-stage codegen, no shuffle at any corpus size).
    * Output: (idCol, n_ws_tokens, n_bpeish_tokens). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit("\\S+"), lit(0)))
        .cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(bpeishPattern), lit(0)))
        .cast("long").as("n_bpeish_tokens"))

  /** Corpus-level n-gram diversity (the "distinct-n" audit): per group
    * (source, language, split …), the total n-gram OCCURRENCE count,
    * the distinct n-gram count — exact up to 60-bit hash collisions
    * (birthday bound: a negligible undercount below ~10⁹ distinct
    * n-grams per group; beyond that the ratio reads slightly low, never
    * high) — and their ratio — low ratios
    * flag template/boilerplate-dominated slices that a per-document
    * repetition score (q172) cannot see because the repetition lives
    * ACROSS documents. Every window rides as its portable 60-bit md5
    * hash (8-byte longs on the shuffle, oracle-replayable); the
    * distinct count is EXACT via a (group, hash) partial aggregation —
    * hash-keyed all the way, no collect, no window. Output:
    * groupCols ++ (n_grams, n_distinct, distinct_ratio). */
  def ngramDiversity(df: DataFrame, groupCols: Seq[String],
                     textCol: String, n: Int): DataFrame = {
    require(n >= 2 && n <= 64, s"n must be in [2, 64], got $n")
    val windows = org.apache.spark.sql.GraftShims.column(
      graft.functions.PortableNgramPosHashes(
        org.apache.spark.sql.GraftShims.expression(split(col(textCol), " ")), n))
    df.select(groupCols.map(col) :+ explode(windows).as("__a"): _*)
      .select(groupCols.map(col) :+ col("__a.h").as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_grams"),
        count_distinct(col("__h")).as("n_distinct"))
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_grams"), 6))
  }

  /** The q53 quality score: length-capped uniqueness ratio. */
  def qualityScore(textCol: Column): Column = {
    val words = split(textCol, " ")
    val nw = size(words)
    least(lit(1.0), nw / lit(100.0)) * (size(array_distinct(words)) / nw)
  }

  /** Kept documents: one canonical row (min id) per distinct text, quality
    * at or above `minQuality`. Output: (id, quality). */
  def clean(df: DataFrame, idCol: String, textCol: String,
            minQuality: Double): DataFrame = {
    val winners = df.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol))
      .select(col(idCol), qualityScore(col(textCol)).as("quality"))
    winners.filter(col("quality") >= minQuality)
  }

  /** Regex scrub (PII-redaction shape): replace every match of `pattern` in
    * `textCol` with `replacement`. Pure map-side codegen'd work — the scrub
    * itself never shuffles, whatever the corpus size. */
  def scrub(df: DataFrame, textCol: String, pattern: String,
            replacement: String): DataFrame =
    df.withColumn(textCol, regexp_replace(col(textCol), pattern, replacement))

  /** Deterministic hash bucket in [0, 100): md5 of the key expression's
    * string form. Content-stable (survives recomputation, repartition, and
    * engine version changes — unlike rand() or monotonically_increasing_id),
    * which is what makes train/val/test assignment reproducible at any
    * scale. */
  def hashBucket(key: Column): Column =
    // first 6 hex chars of md5 = the top 24 bits of the portable 60-bit
    // prefix — one digest kernel call, no hex-string round trip, value
    // bit-identical to conv(substring(md5(x),1,6),16,10)
    shiftright(TextDedup.portableHash60(key.cast("string")), 36) % 100

  /** Reproducible train/val/test split: bucket < trainPct → "train",
    * < trainPct+valPct → "val", else "test". One map-side pass. */
  def hashSplit(df: DataFrame, key: Column,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(key)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic weighted sampling without replacement (priority
    * sampling, Duffield–Lund–Thorup): each row gets priority
    * q = (w · 2^20) div (h40 + 1), where h40 is the top 40 bits of the
    * portable md5 hash of its key (a reproducible stand-in for the uniform
    * variate u, so q ≈ w/u), and the n highest-priority rows win — rows
    * with twice the weight are about twice as likely to make the sample.
    * The quality-weighted corpus subsample every pretraining mix needs,
    * with none of `rand()`'s run-to-run drift: ALL-INTEGER arithmetic
    * (w ≤ ~10^6 keeps w·2^20 far under 2^63), so the selection is
    * bit-identical across engines and a SQL oracle replays it exactly.
    *
    * 100 TB shape: one map-side pass computes priorities; the global top-n
    * is Spark's TakeOrderedAndProject (per-partition heaps of n, one
    * n-row merge at the driver) — no global sort, no shuffle of the
    * corpus. Returns the winners with their (priority, weight). */
  def prioritySample(df: DataFrame, key: Column, weight: Column,
                     n: Int): DataFrame =
    df.withColumn("weight", weight.cast("long"))
      // top 40 bits of the 60-bit portable hash; shiftright = exact
      // integer truncation (a double `/` here could round up across an
      // integer boundary and flip a selection)
      .withColumn("__h40",
        shiftright(TextDedup.portableHash60(key.cast("string")), 20))
      .withColumn("priority", expr("(weight * 1048576) div (__h40 + 1)"))
      .drop("__h40")
      .orderBy(col("priority").desc, key)
      .limit(n)

  /** STRATIFIED [[prioritySample]]: the n highest-priority rows per
    * stratum (same Duffield–Lund–Thorup integer priorities), for mixes
    * that cap every domain/language/shard independently. Selection runs on
    * the TopKPerKey operator — one hash shuffle on the strata, bounded
    * per-partition heaps — so a billion-row stratum never materializes a
    * full window or global sort (the q174 shape, weighted). `tieCol`
    * names the deterministic tie-break column (the sample key's column
    * name). */
  def prioritySamplePerKey(df: DataFrame, strataCols: Seq[String],
                           key: Column, tieCol: String, weight: Column,
                           n: Int): DataFrame =
    graft.plans.TopK.perKey(
      df.withColumn("weight", weight.cast("long"))
        .withColumn("__h40",
          shiftright(TextDedup.portableHash60(key.cast("string")), 20))
        .withColumn("priority", expr("(weight * 1048576) div (__h40 + 1)"))
        .drop("__h40"),
      strataCols, Seq(("priority", false), (tieCol, true)), n)

  /** Passage-level exact deduplication — the finer-grained companion to
    * whole-document dedup (the C4/GPT-3 recipe: drop REPEATED PASSAGES
    * across the corpus, keep each passage's first occurrence, reassemble
    * documents from their surviving passages). Documents are segmented
    * into non-overlapping `passageWords`-word windows; a passage survives
    * iff its (doc, position) is the globally smallest for that exact
    * passage text (winner key = did·2^20 + pos, all-integer and portable —
    * pos is words/passageWords, far under 2^20 for any real document).
    *
    * Returns (idCol, n_passages, n_dup, clean_text): the dup count and
    * the document rebuilt from surviving passages in order ('' when every
    * passage was owned elsewhere).
    *
    * 100 TB shape: segmentation is map-only (one codegen'd
    * sequence/slice/join pipeline, no UDF); the winner election is ONE
    * hash shuffle on passage text with map-side partial min; the
    * reassembly groups by doc id. No windows over unbounded partitions,
    * no driver-side state. A pathologically hot passage (boilerplate
    * repeated a billion times) lands one reducer for its min — a single
    * (passage, min) pair, not the row stream, is what survives the
    * partial aggregation. */
  def passageDedup(df: DataFrame, idCol: String, textCol: String,
                   passageWords: Int = 32): DataFrame = {
    require(passageWords >= 1, "passageWords >= 1")
    val w = passageWords
    val words = split(col(textCol), " ")
    val nPass = ceil(size(words) / lit(w.toDouble)).cast("int")
    val passArr = transform(sequence(lit(0), nPass - 1),
      i => array_join(slice(words, i * w + 1, lit(w)), " "))
    val p = df
      .select(col(idCol).as("did"), posexplode(passArr).as(Seq("pos", "passage")))
      .withColumn("wk", col("did") * lit(1048576L) + col("pos"))
    val winners = p.groupBy("passage").agg(min("wk").as("minwk"))
    p.join(winners, Seq("passage"))
      .withColumn("kept", col("wk") === col("minwk"))
      .groupBy("did")
      .agg(
        count(lit(1)).as("n_passages"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dup"),
        array_join(transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("pos"), col("passage"))))),
          x => x.getField("passage")), " ").as("clean_text"))
      .select(col("did").as(idCol), col("n_passages"), col("n_dup"),
        col("clean_text"))
  }

  /** Overlapping sliding-window chunking — the RAG/embedding ingest shape:
    * each document becomes ceil(max(n-w,0)/s)+1 chunks of up to
    * `chunkWords` words starting every `strideWords` words (overlap
    * w - s). Output: (idCol, chunk_id, n_words, chunk_text), chunk_id
    * counting from 0 in document order.
    *
    * 100 TB shape: pure map-side codegen (split → sequence → transform →
    * posexplode) — zero shuffles at any corpus size; the output feeds
    * straight into the embedding UDF / similarity pipeline partitioned
    * however the scan was. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkWords: Int, strideWords: Int): DataFrame = {
    require(chunkWords >= 1 && strideWords >= 1 && strideWords <= chunkWords,
      "need 1 <= strideWords <= chunkWords")
    val w = chunkWords
    val s = strideWords
    val words = split(col(textCol), " ")
    val n = size(words)
    val nChunks = (ceil(greatest(n - w, lit(0)) / lit(s.toDouble)) + 1).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(words, i * s + 1, lit(w)), " "))
    df.select(col(idCol), n.as("__n"),
        posexplode(chunks).as(Seq("chunk_id", "chunk_text")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        least(lit(w), col("__n") - col("chunk_id") * s).cast("long").as("n_words"),
        col("chunk_text"))
  }

  /** Skip-gram (center, context) pairs at symmetric window `window` — the
    * word2vec-style training-pair generator. Pairs are produced INSIDE
    * each row by codegen array lambdas and exploded, so generation is a
    * pure map at any corpus size; the only shuffle is whatever the caller
    * aggregates afterward. Tokens are materialized (localCheckpoint)
    * before the lambdas so CollapseProject cannot re-inline split() per
    * element (the O(tokens²) blowup [[TextDedup.portableGramHashes]]
    * guards the same way). Output: (center, context), one row per
    * ordered pair within distance ≤ window. */
  def skipgramPairs(df: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1 && window <= 8, s"window must be in [1, 8], got $window")
    // spread the per-row pair-generation lambdas (graft.Db.spread: no-op
    // when the scan already carries ≥ p splits) BEFORE the checkpoint, so
    // the materialized token table — and every lambda pass over it —
    // is partition-parallel instead of inheriting a single-file scan
    val toks = graft.Db.spread(df.select(split(col(textCol), " ").as("w")))
      .localCheckpoint(false)
    val w = col("w")
    def leg(d: Int, rev: Boolean) =
      when(size(w) > d, transform(sequence(lit(1), size(w) - d), i => {
        val (a, b) = (element_at(w, i), element_at(w, i + d))
        if (rev) struct(b.as("center"), a.as("context"))
        else struct(a.as("center"), b.as("context"))
      })).otherwise(array().cast("array<struct<center:string,context:string>>"))
    val legs = (1 to window).flatMap(d => Seq(leg(d, rev = false), leg(d, rev = true)))
    toks.select(explode(concat(legs: _*)).as("p"))
      .select(col("p.center").as("center"), col("p.context").as("context"))
  }

  /** PMI-ranked collocations over [[skipgramPairs]]: pairs scoring high on
    * pointwise mutual information c_xy·N / (c_x·c_y) — the classic
    * collocation / phrase-mining signal. The ranking score is EXACT
    * integer, (c_xy·N·scale) div (c_x·c_y), so an independent engine
    * reproduces the ordering bit-for-bit (true PMI takes a log, which
    * is monotone — the ratio ranks identically). Marginals come from the
    * pair-count table itself (one groupBy each over ≤ distinct-pair rows,
    * checkpointed once), N is a one-row broadcast; requires
    * N²·scale < 2^63 — at larger corpus sizes lower `scale`.
    * Output: (center, context, c_xy, pmi_k) top `k` by
    * (pmi_k desc, center, context). */
  def pmiCollocations(df: DataFrame, textCol: String, window: Int,
                      minCount: Long, k: Int,
                      scale: Long = 1000L): DataFrame = {
    val pc = skipgramPairs(df, textCol, window)
      .groupBy("center", "context").agg(count(lit(1)).as("c_xy"))
      .localCheckpoint(false) // reused 3×: marginals + the scored join
    val cx = pc.groupBy("center").agg(sum("c_xy").as("c_x"))
    val cy = pc.groupBy("context").agg(sum("c_xy").as("c_y"))
    val n = pc.agg(sum("c_xy").as("n_pairs"))
    pc.where(col("c_xy") >= minCount)
      .join(cx, "center").join(cy, "context")
      .crossJoin(broadcast(n)) // one row — hygiene-exempt by construction
      .selectExpr("center", "context", "c_xy",
        s"(c_xy * n_pairs * $scale) div (c_x * c_y) AS pmi_k")
      .orderBy(col("pmi_k").desc, col("center"), col("context"))
      .limit(k)
  }

  /** Per-document bigram language-model fluency score — the perplexity-
    * style quality filter of a training pipeline, in EXACT integer
    * arithmetic so an independent engine replays every score: train
    * corpus-level bigram counts, score each document by the mean
    * conditional frequency of its bigrams,
    * lm_score = (Σ (c_xy·scale) div c_x) div n_bigrams. (True perplexity
    * exponentiates mean log-prob — monotone in mean log-prob, and this
    * mean-conditional-frequency form is the log-free rational analog the
    * BM25 gate (q92) uses for idf: deterministic where libm ln() is not.)
    * Documents with < 2 tokens have no bigrams and are absent from the
    * output.
    *
    * 100 TB shape: bigram generation is a per-row codegen array lambda
    * (map-only); then one count shuffle keyed by bigram, one join of the
    * token stream back to the counts (same key), one per-doc aggregation.
    * Nothing driver-side; intermediate ≈ token count, never tokens². */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    scale: Long = 1000000L): DataFrame = {
    // NOT spread (measured r15): the bigram lambda is element_at pairs —
    // no digest work — and the checkpointed table feeds shuffling joins
    // anyway, so the extra exchange cost more than the map parallelism
    // bought (q203 ~1.0 -> ~1.4 s)
    val toks = df.select(col(idCol), split(col(textCol), " ").as("w"))
      .localCheckpoint(false) // materialize before the lambda (see skipgramPairs)
    val w = col("w")
    val bg = toks.select(col(idCol),
        explode(when(size(w) > 1, transform(sequence(lit(1), size(w) - 1),
            i => struct(element_at(w, i).as("x"), element_at(w, i + 1).as("y"))))
          .otherwise(array().cast("array<struct<x:string,y:string>>"))).as("p"))
      .select(col(idCol), col("p.x").as("x"), col("p.y").as("y"))
      .localCheckpoint(false) // reused: counts + the scored join-back
    val cxy = bg.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    val cx = cxy.groupBy("x").agg(sum("c_xy").as("c_x"))
    bg.join(cxy, Seq("x", "y")).join(cx, Seq("x"))
      .select(col(idCol), expr(s"(c_xy * $scale) div c_x").as("__sc"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__sc")).as("__tot"))
      .selectExpr(idCol, "n_bigrams", "__tot div n_bigrams AS lm_score")
  }

  /** Deterministic stratified sampling: keep rows whose hash bucket falls
    * under the stratum's percentage. `rates` maps stratum value → pct
    * [0,100]; unlisted strata fall back to `defaultPct`. */
  def stratifiedSample(df: DataFrame, strataCol: String, key: Column,
                       rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (v, p)) =>
      when(col(strataCol) === v, p).otherwise(acc)
    }
    df.filter(hashBucket(key) < pct)
  }

  /** Greedy sequence packing for training batches: documents are laid out in
    * `idCol` order on a token tape and each gets the context-window bin its
    * FIRST token falls in (docs may straddle a boundary — the standard
    * concatenate-then-chunk packing). Deterministic given the order column.
    * Output always carries (shard, seq_bin); hybrid routing: at or under
    * `globalMaxRows` the corpus is ONE tape (shard 0, exact global order);
    * above it, packing runs shard-parallel (`packSequencesSharded`) because
    * a global running sum is a single-partition window — one task sorting
    * the whole corpus at 100 TB. Same guard shape as
    * Similarity.nearDupPairs. */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
                    windowTokens: Int, globalMaxRows: Long = 1 << 20,
                    nShards: Int = 32): DataFrame = {
    val in = df.localCheckpoint(false)
    // saturating probe bound: globalMaxRows + 1 would overflow Long.MaxValue
    val probeRows =
      if (globalMaxRows >= Int.MaxValue - 1) Int.MaxValue
      else (globalMaxRows + 1).toInt
    val probe = in.limit(probeRows).count()
    if (probe <= globalMaxRows) packSequencesGlobal(in, idCol, tokens, windowTokens)
    else packSequencesSharded(in, idCol, tokens, windowTokens, nShards)
  }

  /** The exact single-tape packing (shard 0, one global running sum over
    * `idCol` order). Callers whose downstream contract assumes ONE tape
    * (e.g. an oracle that packs globally) must use this explicitly — the
    * guarded `packSequences` silently reroutes to sharded packing above
    * `globalMaxRows`, which changes bin assignment. */
  def packSequencesGlobal(df: DataFrame, idCol: String, tokens: Column,
                          windowTokens: Int): DataFrame =
    df.withColumn("n_tok", tokens)
      .withColumn("shard", lit(0L))
      .withColumn("seq_bin",
        floor((sum(col("n_tok")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col(idCol)))
          - col("n_tok")) / windowTokens).cast("long"))

  /** Content-stable shard in [0, nShards): md5 of the key's string form, the
    * same engine-agnostic hash family as `hashBucket`. */
  def shardOf(key: Column, nShards: Int): Column =
    shiftright(TextDedup.portableHash60(key.cast("string")), 36) % nShards

  /** Shard-parallel sequence packing: the corpus is hash-split into
    * `nShards` independent token tapes, each packed in `idCol` order, and
    * the bin key becomes (shard, seq_bin). Every shard's running sum is a
    * window PARTITIONED on the shard — nShards concurrent sorts of 1/nShards
    * of the data instead of one global sort, which is the layout a trainer
    * wants anyway (shards ≈ data-parallel readers). Deterministic: the shard
    * assignment is content-stable md5, not a partition id. */
  def packSequencesSharded(df: DataFrame, idCol: String, tokens: Column,
                           windowTokens: Int, nShards: Int): DataFrame =
    df.withColumn("n_tok", tokens)
      .withColumn("shard", shardOf(col(idCol), nShards))
      .withColumn("seq_bin",
        floor((sum(col("n_tok")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("shard")).orderBy(col(idCol)))
          - col("n_tok")) / windowTokens).cast("long"))

  /** Dedup-keep-latest: one row per key, the one with the greatest
    * `tsCol` (ties broken by ascending `tieCol`) — the standard
    * latest-record-wins dedup of event/CDC pipelines. Runs on the
    * TopKPerKey physical operator (partial per-partition heaps → one
    * bounded shuffle → final heaps), so the shuffle carries at most one
    * row per (key, map partition) instead of the full table that a
    * window row_number would sort. */
  def keepLatest(df: DataFrame, keys: Seq[String], tsCol: String,
                 tieCol: String): DataFrame =
    graft.plans.TopK.perKey(df, keys, Seq((tsCol, false), (tieCol, true)), 1)

  /** EXACT top-k heavy hitters over a (possibly huge) key stream, without
    * shuffling the stream: pass 1 builds per-partition Misra–Gries summaries
    * (capacity-bounded decrement sketches — map-side only, no shuffle) whose
    * union is a proven superset of every key with global frequency above the
    * total number of decrement rounds D (a key evicted everywhere lost at
    * most 1 count per round, so its true frequency is ≤ D); pass 2
    * exact-counts ONLY those candidates via a broadcast semi-join — the
    * shuffle carries candidate keys, not the stream. If the k-th recounted
    * frequency does not clear D — the sketch was too small for the skew —
    * the operator falls back to the full exact aggregation (same
    * guarded-hybrid shape as nearDupPairs), so the result is ALWAYS exact
    * and oracle-comparable. Output: (key, n) descending, key tiebreak. */
  def heavyHitters(df: DataFrame, key: Column, k: Int,
                   capacity: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(key.cast("string").as("hh_key"))
      .filter(col("hh_key").isNotNull)
    val exact = (in: DataFrame) => in.groupBy("hh_key")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("hh_key")).limit(k)
    // task retries can over-count the accumulator — only ever making the
    // exactness guard MORE conservative, never less
    val decRounds = spark.sparkContext.longAccumulator("mg_decrement_rounds")
    val cands = keyed.as[String].mapPartitions { it =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      it.foreach { s =>
        counts.get(s) match {
          case Some(v) => counts.update(s, v + 1)
          case None if counts.size < capacity => counts.update(s, 1L)
          case None => // decrement-all: the Misra-Gries eviction step
            decRounds.add(1)
            val dead = List.newBuilder[String]
            counts.foreachEntry((ky, v) =>
              if (v == 1L) dead += ky else counts.update(ky, v - 1))
            dead.result().foreach(counts.remove)
        }
      }
      counts.keysIterator
    }.toDF("hh_key").distinct()
    val top = exact(keyed.join(broadcast(cands), Seq("hh_key"))).collect()
    // decRounds is complete here: the broadcast materialized every sketch
    if (top.length >= k && top.last.getLong(1) > decRounds.value)
      top.map(r => (r.getString(0), r.getLong(1))).toSeq.toDF("hh_key", "n")
    else exact(keyed) // sketch too small for this skew: recount everything
  }

  /** Per-document repetition ratio: frequency of the most repeated word over
    * total words — the cheap boilerplate/spam signal. Shuffle-keyed on
    * (id, word), embarrassingly parallel at any corpus size. */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .groupBy(idCol, "word").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg((max(col("c")).cast("double") / sum(col("c"))).as("rep_ratio"))

  /** Gopher-style within-document repetition signals (Rae et al. 2021 §A1.1,
    * adapted to word granularity — the corpus is single-line text):
    * `dup_words` = surplus word occurrences beyond each word's first
    * (duplicate-word mass), `top2_chars` = character mass of the heaviest
    * word 2-gram (occurrences × gram length, the boilerplate signal), and a
    * `keep` verdict at the usual thresholds (duplicate-word fraction ≤ 0.30,
    * top-2-gram character fraction ≤ 0.20) evaluated by INTEGER
    * cross-multiplication so both engines compare exactly, no float ulps.
    *
    * Unlike [[repetitionRatio]] this never shuffles: every signal is a
    * per-row array-lambda pipeline (split → transform/filter/array_max)
    * inside whole-stage codegen, so the operator is map-only at any corpus
    * size — the 100 TB plan is exactly the local one. The per-row cost is
    * O(words × distinct 2-grams), bounded by document length. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol), length(col(textCol)).as("len_chars"),
        split(col(textCol), " ").as("ws"))
      // sequence(0, -1) would DESCEND, not produce empty — guard sub-2-word
      // docs to a typed empty gram list
      .withColumn("gs", when(size(col("ws")) >= 2,
          expr("transform(sequence(0, size(ws)-2), i -> concat(ws[i], ' ', ws[i+1]))"))
        .otherwise(expr("CAST(array() AS array<string>)")))
    // heaviest 2-gram via sort + run-length scan: O(g log g) comparisons and
    // ONE lambda invocation per gram, where the naive
    // transform(array_distinct(gs), x -> filter(gs, ...)) form is O(g ×
    // distinct g) lambda calls — quadratic in document length, which real
    // 10k-word documents would feel. Sorting groups equal grams into runs,
    // so max(run length × gram length) equals max over distinct grams of
    // (count × length).
    val top2 = expr(
      """aggregate(array_sort(gs),
        |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
        |  (a, x) -> named_struct(
        |    'prev', x,
        |    'run', IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1),
        |    'best', greatest(a.best,
        |      IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1) * length(x))),
        |  a -> a.best)""".stripMargin)
    base.select(col(idCol),
        size(col("ws")).as("n_words"),
        (size(col("ws")) - size(array_distinct(col("ws")))).as("dup_words"),
        coalesce(top2, lit(0)).as("top2_chars"),
        col("len_chars"))
      .withColumn("keep",
        col("dup_words") * 10 <= col("n_words") * 3 &&
          col("top2_chars") * 5 <= col("len_chars"))
  }

  /** Per-document n-gram novelty: the fraction of a document's distinct
    * word-3-gram shingles whose globally FIRST owner (smallest doc id) is
    * this document — the memorization/diversity signal that ranks
    * boilerplate-heavy documents low before sampling. Deterministic by
    * construction: first ownership is a min, not an arrival order.
    *
    * Shape: one codegen shingle-hash pass ([[TextDedup.shingleRows]] —
    * 8-byte portable 60-bit keys, the q209 lesson, collision-free to
    * ~2^30 distinct grams), ONE gram-keyed min aggregation with map-side
    * partials (a billion-fold repeated gram reduces to one (gram, min)
    * pair per partition before the shuffle), one join back on the gram
    * key, one per-doc count aggregation. Documents under 3 words have no
    * shingles and are absent. Output: (idCol, n_grams, n_novel,
    * novelty). */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rows = TextDedup.shingleRows(df, idCol, textCol)
    val firstOwner = rows.groupBy("s").agg(min(col(idCol)).as("__first"))
    rows.join(firstOwner, Seq("s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("__first") === col(idCol), 1)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 4))
  }

  /** Token-budget mixture sampling: from each stratum (source domain,
    * language, shard), keep documents in deterministic md5-of-key order
    * until the stratum's TOKEN budget is exhausted — the "give me 1B
    * tokens per domain" step of composing a pretraining mix, where
    * [[prioritySamplePerKey]]'s COUNT cap can't hit a token target.
    * A document is kept iff the running total BEFORE it is under the
    * budget, so every stratum gets at least one document and overshoots
    * by at most one document's tokens.
    *
    * Shape: one exchange on the strata columns, one sorted cumulative-sum
    * window per stratum (running state = one BIGINT), then the filter —
    * the per-stratum ordered scan is the operator's semantic contract
    * (same family as SCD2). The md5 order stands in for any quality
    * ranking; pass `order` to override. Output: strataCols ++ (id,
    * tokens, cum_tokens) for the kept rows. */
  def tokenBudgetMix(df: DataFrame, strataCols: Seq[String], idCol: String,
                     tokens: Column, budget: Long,
                     order: Option[Seq[Column]] = None): DataFrame = {
    val ord = order.getOrElse(
      Seq(md5(col(idCol).cast("string")), col(idCol)))
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // window BEFORE the projection, so a custom `order` may reference any
    // input column (a quality score, say), not just the retained three
    df.withColumn("tokens", tokens.cast("long"))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .where(col("cum_tokens") - col("tokens") < budget)
      .select(strataCols.map(col) :+ col(idCol) :+ col("tokens")
        :+ col("cum_tokens"): _*)
  }
}
