package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General-purpose text deduplication operators over ANY DataFrame with an
  * id column and a text column — the library surface behind the
  * `documents`-table queries in graft.queries.TextOps.
  *
  * Design for scale (the 100 TB posture): pair generation never enumerates
  * doc×doc — candidates come from shuffle keys (prefix shingles / LSH band
  * buckets / signature blocks), per-row sketching is single-pass codegen
  * (graft.functions.{MinHashBands, SimHash64}), and documents are tokenized
  * exactly once via posexplode + windowed lead.
  *
  * Reused intermediates are materialized with `localCheckpoint` rather than
  * `persist`: blocks are registered with the ContextCleaner and freed when the
  * result DataFrame is garbage-collected, so a long-lived session does not
  * accumulate CacheManager entries (persist() pins the plan until an explicit
  * unpersist). On a real cluster with executor churn you would swap this for
  * reliable checkpointing to the cluster FS; the operator shape is identical.
  */
object TextDedup {

  /** diagnostics: rounds the last duplicateClusters call took to converge */
  @volatile private[graft] var lastPropagationRounds: Int = 0

  /** Per-doc hashed shingle sets: (id, h0: SORTED distinct array<long>,
    * nsh). One codegen pass per row (graft.functions.NgramHashes) — no
    * explode/window shuffle, no collect_list re-aggregation; sorted output
    * feeds SortedIntersectCount verification with zero per-pair sorting.
    * The repartition spreads single-file parquet inputs across cores. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashes = org.apache.spark.sql.GraftShims.column(
      graft.functions.NgramHashes(
        org.apache.spark.sql.GraftShims.expression(split(col(textCol), " ")), 3))
    df.repartition(col(idCol))
      .select(col(idCol), hashes.as("h0"))
      .filter(size(col("h0")) > 0)
      .withColumn("nsh", size(col("h0")).cast("long"))
  }

  /** Distinct word-3-gram shingle hashes: one (id, s) row per shingle. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    shingleSets(df, idCol, textCol).select(col(idCol), explode(col("h0")).as("s"))

  /** Distinct word-n-gram shingle hashes at a caller-chosen n. */
  def shingleRowsN(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val hashes = org.apache.spark.sql.GraftShims.column(
      graft.functions.NgramHashes(
        org.apache.spark.sql.GraftShims.expression(split(col(textCol), " ")), n))
    df.select(col(idCol), explode(hashes).as("s"))
  }

  /** Decontamination primitive: ids of `corpus` documents sharing at least
    * one word-n-gram with ANY document of `benchmark` (the train-vs-eval
    * overlap check every training-data pipeline runs before a model sees the
    * data). Candidates come from an equi-join on the shingle hash — the
    * benchmark side is deduplicated to one row per distinct shingle first,
    * so a stop-phrase cannot fan out quadratically. */
  def contaminated(corpus: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String, n: Int = 5): DataFrame =
    shingleRowsN(corpus, idCol, textCol, n)
      .join(shingleRowsN(benchmark, idCol, textCol, n)
        .select(col("s")).distinct(), Seq("s"))
      .select(idCol).distinct()

  /** Exact dedup: one canonical row (min id) per identical text value. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(textCol)
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Exact n-gram Jaccard near-dup pairs at or above `threshold`, via
    * prefix-filtered candidate generation (the AllPairs/PPJoin family —
    * Bayardo, Ma & Srikant, WWW'07) + exact set verification.
    *
    * Why not a plain self-join on shingle hash: a stop-phrase shingle shared
    * by d documents emits d² rows on ONE shuffle key — quadratic and skewed,
    * the classic 100 TB killer. Prefix filtering is the exact fix: order each
    * document's shingles by ascending global document frequency (rarest
    * first) and join only each doc's first n - ceil(t·n) + 1 shingles.
    * Any pair with Jaccard ≥ t shares ≥ ceil(t·n) shingles, so its smallest
    * common shingle (in the global rare-first order) provably lands inside
    * BOTH prefixes — no qualifying pair is missed — while the hottest
    * shingles (the blowup keys) sit at the END of every doc's order and
    * never enter candidate generation. Candidates are then verified with the
    * exact Jaccard over the full shingle sets, so output values are identical
    * to the naive all-shingles join.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    val sets = shingleSets(df, idCol, textCol).localCheckpoint(false)
    val rows = sets.select(col(idCol), col("nsh"), explode(col("h0")).as("s"))
    // global document frequency per shingle — the ordering key that pushes
    // hot shingles out of every prefix
    val dfreq = rows.groupBy("s").agg(count(lit(1)).as("dfreq"))
    // The 1e-6 slack inside both ceil()s keeps the bounds CONSERVATIVE under
    // floating-point rounding: t/(1+t) (and t·n) computed in double can land
    // an ulp above the exact rational, which would tighten ceil by one and
    // silently prune a pair whose double-evaluated Jaccard passes the final
    // filter (e.g. t=0.4, na+nb=7: exact α=2, naive double α=3). The slack
    // only ever ADMITS extra candidates — exact verification culls them.
    //
    // Ranks come from one per-doc array sort (collect → sort_array → slice →
    // posexplode) instead of a window: same (dfreq, s) order, one shuffle on
    // the doc id, a ~50-element in-memory sort per row, and ONLY the prefix
    // rows (the first n − ceil(t·n) + 1) ever enter the candidate shuffle.
    val prefixLen =
      (col("nsh") - ceil(lit(threshold) * col("nsh") - lit(1e-6)) + 1).cast("int")
    val prefix = rows.join(dfreq, Seq("s"))
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("dfreq"), col("s")))).as("arr"),
        max(col("nsh")).as("nsh"))
      .select(col(idCol), col("nsh"),
        posexplode(slice(col("arr"), lit(1), prefixLen)).as(Seq("pos", "w")))
      .select(col(idCol), col("w.s").as("s"), col("w.dfreq").as("dfreq"),
        (col("pos") + 1).as("rk"), col("nsh"))
    // Positional + length pruning (PPJoin-style, Xiao et al. WWW'08), both
    // provably lossless: a qualifying pair's globally-first common shingle w
    // (positions ia/ib in the rarity order) is inside both prefixes, every
    // common shingle sits at-or-after it, so overlap ≤ min(na-ia, nb-ib)+1,
    // which must reach α = ceil(t/(1+t)·(na+nb)); and t ≤ na/nb ≤ 1/t.
    // Ranks are assigned by the SAME global (dfreq, s) order inside every
    // document, so the common-shingle sets of a pair are order-isomorphic:
    // u < v globally ⟺ ia(u) < ia(v) AND ib(u) < ib(v). Two consequences,
    // both provably lossless:
    //  - fw (globally-FIRST observed common shingle): no common shingle
    //    precedes it (it would sit in both prefixes and be observed), so
    //    overlap ≤ 1 + min(na - fw.ia, nb - fw.ib).
    //  - lw (globally-LAST observed) + cpc (observed count): every common
    //    shingle ≤ lw is in both prefixes (hence observed — cpc counts ALL
    //    of them), and every common shingle > lw has ia > lw.ia and
    //    ib > lw.ib, so overlap ≤ cpc + min(na - lw.ia, nb - lw.ib).
    // Both must reach α = ceil(t/(1+t)·(na+nb)). A third lossless filter
    // comes from counting: a qualifying pair's commons w1 < … < wm (m ≥ α)
    // satisfy rank_a(wk) ≤ na − (m − k) (the m−k later commons occupy larger
    // ranks), so wk lands in a's prefix whenever k ≤ m − ceil(t·na) + 1, and
    // in BOTH prefixes for k up to the smaller such budget. Hence
    //   cpc ≥ α − max(ceil(t·na), ceil(t·nb)) + 1
    // — for a template-heavy corpus (observed cpc ≈ 1, required ≈ 0.16·n)
    // this is the filter that kills ~99% of false candidates. Slack keeps it
    // conservative: α computed low, the ceil()s computed high, so rounding
    // can only LOWER the requirement.
    val alpha =
      ceil(lit(threshold / (1 + threshold)) * (col("na") + col("nb")) - lit(1e-6))
    val cand = prefix
      .select(col(idCol).as("a_id"), col("s"), col("dfreq"),
        col("rk").as("ia"), col("nsh").as("na"))
      .join(prefix.select(col(idCol).as("b_id"), col("s"),
        col("rk").as("ib"), col("nsh").as("nb")), Seq("s"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(max("na").as("na"), max("nb").as("nb"), count(lit(1)).as("cpc"),
        min(struct(col("dfreq"), col("s"), col("ia"), col("ib"))).as("fw"),
        max(struct(col("dfreq"), col("s"), col("ia"), col("ib"))).as("lw"))
      .filter(
        col("nb") >= lit(threshold) * col("na") &&
        col("na") >= lit(threshold) * col("nb") &&
        least(col("na") - col("fw.ia"), col("nb") - col("fw.ib")) + 1 >= alpha &&
        col("cpc") + least(col("na") - col("lw.ia"), col("nb") - col("lw.ib")) >= alpha &&
        col("cpc") >= alpha + 1 -
          greatest(ceil(lit(threshold) * col("na") + lit(1e-6)),
                   ceil(lit(threshold) * col("nb") + lit(1e-6))))
      .select("a_id", "b_id")
    // exact verification over full shingle sets (values identical to the
    // naive join: h0 is the distinct shingle set, so |∩| == common count);
    // h0 is already sorted, so per-pair work is one codegen two-pointer merge
    val common = org.apache.spark.sql.GraftShims.column(
      graft.functions.SortedIntersectCount(
        org.apache.spark.sql.GraftShims.expression(col("sa")),
        org.apache.spark.sql.GraftShims.expression(col("sb"))))
    cand
      .join(sets.select(col(idCol).as("a_id"), col("h0").as("sa")), Seq("a_id"))
      .join(sets.select(col(idCol).as("b_id"), col("h0").as("sb")), Seq("b_id"))
      .withColumn("common", common)
      .withColumn("jaccard",
        col("common") / (size(col("sa")) + size(col("sb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** MinHash(bands×rows) + LSH bucket join + exact-Jaccard verification. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, nBands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val hashed = shingleSets(df, idCol, textCol).localCheckpoint(false)
    val bandHashes = org.apache.spark.sql.GraftShims.column(
      graft.functions.MinHashBands(
        org.apache.spark.sql.GraftShims.expression(col("h0")), nBands, rowsPerBand))
    val bands = hashed
      .select(col(idCol), posexplode(bandHashes).as(Seq("band", "bh")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
          && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"))
      .distinct()
    // h0 is sorted+distinct: exact-Jaccard verification is a codegen merge
    val common = org.apache.spark.sql.GraftShims.column(
      graft.functions.SortedIntersectCount(
        org.apache.spark.sql.GraftShims.expression(col("sa")),
        org.apache.spark.sql.GraftShims.expression(col("sb"))))
    cand
      .join(hashed.select(col(idCol).as("a_id"), col("h0").as("sa")), Seq("a_id"))
      .join(hashed.select(col(idCol).as("b_id"), col("h0").as("sb")), Seq("b_id"))
      .withColumn("common", common)
      .withColumn("jaccard",
        col("common") / (size(col("sa")) + size(col("sb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Duplicate CLUSTERS from near-dup pairs: iterative min-label
    * propagation (the standard scalable connected-components — each round
    * every node adopts the smallest cluster label among itself and its
    * neighbours; rounds ≤ component diameter, each round one shuffle join).
    * Returns (id, cluster) for EVERY input row, cluster = smallest reachable
    * id — the canonical representative of the duplicate group. Labels are
    * re-materialized per round (localCheckpoint) so lineage stays bounded
    * however many rounds run.
    */
  def duplicateClusters(df: DataFrame, idCol: String,
                        pairs: DataFrame, driverMaxEdges: Long = 4000000L): DataFrame = {
    // materialize the pair set ONCE: both union branches and every
    // propagation round reuse it (otherwise the possibly-expensive pair
    // generation would run once per branch)
    val p = pairs.select(col("a_id"), col("b_id")).localCheckpoint(false)
    // The near-dup graph is a sliver of the corpus (0.1% dupes of 100 TB is
    // still only ~10⁸ edges); below the guard, classic union-find on the
    // driver beats diameter-many distributed rounds outright — the same
    // guarded-hybrid shape as Similarity.nearDupPairs. Above it, the
    // log-diameter propagation loop below is the cluster-scale path.
    if (p.count() <= driverMaxEdges)
      return duplicateClustersDriver(df, idCol, p)
    val sym = p.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(p.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint(false)
    // only edge ENDPOINTS participate in propagation — at corpus scale the
    // near-dup graph is a sliver of the table (0.1% dupes in a 100 TB corpus
    // = 1000× smaller propagation state); every other row is a singleton
    // cluster attached by the final left join. Labels keep the id column's
    // own type (min/least order any orderable type), so string ids work too.
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(false)
    var changed = 1L
    TextDedup.lastPropagationRounds = 0
    while (changed > 0) {
      TextDedup.lastPropagationRounds += 1
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("cluster").as("ncl")), Seq("dst"))
        .groupBy("src").agg(min("ncl").as("nmin"))
      // one checkpointed join per round: both the convergence check and the
      // next label set derive from it (no extra join against the old labels)
      val joined = labels
        .join(neighborMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .localCheckpoint(false)
      changed = joined.filter(col("nmin") < col("cluster")).count()
      val stepped = joined.select(col("id"),
        least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
      // pointer jumping: also adopt the CURRENT label of the node my label
      // points to (label(label(x))) — chains collapse in O(log diameter)
      // rounds instead of O(diameter), the standard shortcut of scalable
      // connected-components
      labels = stepped.as("x")
        .join(stepped.select(col("id").as("cl2"), col("cluster").as("cc")).as("y"),
          col("x.cluster") === col("cl2"), "left")
        .select(col("x.id").as("id"),
          least(col("x.cluster"), coalesce(col("cc"), col("x.cluster"))).as("cluster"))
        .localCheckpoint(false)
    }
    df.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster"), col("id")).as("cluster"))
  }

  /** Driver-side connected components (path-compressed union-find) over a
    * collected edge list; the id→min-member mapping is broadcast back and
    * left-joined so non-endpoint rows stay singletons. Works for any
    * orderable id type (ids of one column share a runtime Comparable type).
    */
  private def duplicateClustersDriver(df: DataFrame, idCol: String,
                                      p: DataFrame): DataFrame = {
    val parent = new java.util.HashMap[Any, Any]()
    def find(x0: Any): Any = {
      var x = x0
      while (parent.get(x) != null && parent.get(x) != x) {
        val g = parent.get(parent.get(x))
        if (g != null) parent.put(x, g) // path halving
        x = parent.get(x)
      }
      if (parent.get(x) == null) parent.put(x, x)
      x
    }
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    p.collect().foreach { r =>
      val (ra, rb) = (find(r.get(0)), find(r.get(1)))
      if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    val roots = new java.util.HashMap[Any, Any]() // root -> min member
    parent.keySet().forEach { k =>
      val r = find(k)
      val cur = roots.get(r)
      if (cur == null || lt(k, cur)) roots.put(r, k)
    }
    val spark = df.sparkSession
    val dt = p.schema.fields(0).dataType
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    parent.keySet().forEach { k =>
      rows.add(org.apache.spark.sql.Row(k, roots.get(find(k))))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", dt),
      org.apache.spark.sql.types.StructField("cl", dt)))
    val mapping = spark.createDataFrame(rows, schema)
    df.select(col(idCol).as("id"))
      .join(broadcast(mapping), Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cl"), col("id")).as("cluster"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, via
    * pigeonhole banding: the 64-bit signature is split into
    * maxHamming + 1 contiguous blocks, so any pair within the hamming budget
    * differs in at most maxHamming blocks and therefore agrees EXACTLY on at
    * least one block (pigeonhole — Manku, Jain & Das Sarma, WWW'07 §3).
    * Candidates come from an equi-join on (block index, block bits) — a
    * plain shuffle key, never an all-pairs product — and are verified with
    * one codegen'd `bit_count(xor)`. Output is identical to the naive
    * all-pairs scan.
    */
  /** One-expression SimHash64 of a whitespace-tokenized text column
    * (unigram shingles) — shared by the batch and streaming band paths so
    * both see bit-identical signatures. */
  def simhashOf(textCol: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      graft.functions.SimHash64(org.apache.spark.sql.GraftShims.expression(
        org.apache.spark.sql.GraftShims.column(graft.functions.NgramHashes(
          org.apache.spark.sql.GraftShims.expression(split(textCol, " ")), 1)))))

  /** The pigeonhole band array of a 64-bit signature: maxHamming+1 blocks,
    * each a (blk, bits) struct — any pair within maxHamming Hamming distance
    * agrees on at least one whole block. */
  def simhashBands(sim: Column, maxHamming: Int): Column = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val nBlocks = maxHamming + 1
    val base = 64 / nBlocks
    val widths = Seq.tabulate(nBlocks)(i => if (i < 64 % nBlocks) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    array((0 until nBlocks).map { i =>
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1L
      struct(lit(i).as("blk"),
        shiftrightunsigned(sim, offsets(i)).bitwiseAND(lit(mask)).as("bits"))
    }: _*)
  }

  // --- engine-portable (differentially testable) sketch variants -----------
  //
  // The xxhash64-based sketches above are the perf path (single-pass codegen
  // Expressions), but no independent engine can replay xxhash64-derived
  // signatures, so their queries could only ever get rows-only checks. The
  // variants below re-express the SAME algorithms on a hash both engines
  // compute bit-identically — the leading hex of md5 — so a DuckDB oracle
  // regenerates signatures, buckets, candidates and verified output exactly
  // (the full-result differential methodology of the reference's
  // BenchAndVerify, /root/reference/src/benchmark/BenchAndVerify.java:176-212).

  /** 60-bit hash of a string column: leading 15 hex chars of md5.
    * DuckDB twin: ('0x' || substring(md5(x), 1, 15))::BIGINT.
    * Evaluated by the single-call codegen kernel
    * ([[graft.functions.PortableHash60]] → Portable.hash60) — the former
    * conv(substring(md5(...),1,15),16,10) formulation materialized a
    * 32-char hex string, a substring copy, and a base-16 parse per row on
    * the hottest expression in the portable family; the kernel reads the
    * same leading 60 bits straight off the digest, bit-identically. */
  def portableHash60(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(graft.functions.PortableHash60(
      org.apache.spark.sql.GraftShims.expression(c.cast("binary"))))

  /** Mersenne-31 modulus of the portable permutation family: all arithmetic
    * (a·h + b with a < 2^29, h < p) stays under 2^61, so BOTH engines
    * evaluate it in plain BIGINT with no overflow. */
  val PortableP = 2147483647L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  /** j-th MinHash permutation constants, themselves derived from md5 so the
    * SQL twin regenerates them in-query (no out-of-band constant table):
    * a_j = hex(md5('a'||j))[1..7] · 2 + 1 (odd), b_j = hex(md5('b'||j))[1..7]. */
  private[graft] def permA(j: Int): Long =
    java.lang.Long.parseLong(md5hex("a" + j).substring(0, 7), 16) * 2 + 1
  private[graft] def permB(j: Int): Long =
    java.lang.Long.parseLong(md5hex("b" + j).substring(0, 7), 16)

  /** Distinct portable word-n-gram hashes mod PortableP: one (id, h) row per
    * distinct gram. Token arrays are materialized (localCheckpoint) before
    * the gram lambda so CollapseProject cannot inline the split() into every
    * lambda element (the O(tokens²) blowup), and gram strings join tokens
    * with ' ' exactly like the SQL twin. */
  def portableGramHashes(df: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame = {
    val toks = df.repartition(col(idCol))
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .localCheckpoint(false)
    val grams =
      when(size(col("w")) >= n,
        transform(sequence(lit(1), size(col("w")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("w"), i + k)): _*)))
        .otherwise(array().cast("array<string>"))
    toks.select(col(idCol), explode(grams).as("g"))
      .select(col(idCol), (portableHash60(col("g")) % PortableP).as("h"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs on the portable hash family — identical
    * shape to `minhashLshPairs` (nBands × rowsPerBand signature, banded
    * bucket equi-join, exact-Jaccard verification of candidates), but every
    * number is DuckDB-replayable: shingles are word-3-gram strings hashed
    * with md5, permutations are (a_j·h + b_j) mod 2^31−1, and a band's
    * bucket is the base-31 combination of its row minima. Jaccard is
    * computed over the portable hash sets on both engines. */
  def minhashLshPairsPortable(df: DataFrame, idCol: String, textCol: String,
                              threshold: Double, nBands: Int = 16,
                              rowsPerBand: Int = 4): DataFrame = {
    val (sig, bands) = portableSigAndBands(df, idCol, textCol, nBands, rowsPerBand)
    val cand = bands.select(col(idCol).as("a_id"), col("band"), col("bh"))
      .join(bands.select(col(idCol).as("b_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    verifyCandidates(cand, sig, sig, idCol, threshold)
  }

  /** Cross-corpus fuzzy match on the same portable MinHash+LSH family:
    * near-dup (left, right) pairs BETWEEN two corpora — the fuzzy
    * generalization of `contaminated` (which requires an exact shared
    * shingle). Each side computes its own signatures; candidates come from
    * a (band, bucket) equi-join across sides — never an all-pairs product —
    * and are verified with exact Jaccard over the portable hash sets, so
    * the DuckDB oracle replays the ENTIRE pipeline. At cluster scale the
    * band join shuffles each side once on (band, bh); the verification join
    * touches only surviving candidates. Reference analog: none (SkinnerDB
    * has no text pipeline) — shape follows Broder's resemblance + banded
    * LSH as in q56. */
  def crossCorpusLshPairsPortable(left: DataFrame, right: DataFrame,
                                  idCol: String, textCol: String,
                                  threshold: Double, nBands: Int = 16,
                                  rowsPerBand: Int = 4): DataFrame = {
    val (sigL, bandsL) = portableSigAndBands(left, idCol, textCol, nBands, rowsPerBand)
    val (sigR, bandsR) = portableSigAndBands(right, idCol, textCol, nBands, rowsPerBand)
    val cand = bandsL.select(col(idCol).as("a_id"), col("band"), col("bh"))
      .join(bandsR.select(col(idCol).as("b_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      // sides are normally disjoint corpora, but if a caller passes
      // overlapping frames a document must not "contaminate" itself at
      // jaccard 1.0 — drop same-id pairs on the candidate stream (free: it
      // rides the band join's filter, before the verification join)
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id").distinct()
    verifyCandidates(cand, sigL, sigR, idCol, threshold)
  }

  /** Portable signatures (`idCol`, hs = sorted distinct gram hashes, mm =
    * the nBands·rowsPerBand permutation minima) plus the exploded
    * (id, band, bucket) band rows for LSH candidate generation. One codegen
    * pass per row computes hs AND all minima (graft.functions.Portable —
    * md5-exact, so the DuckDB replay is unchanged); the previous
    * SQL-expression pipeline spent two shuffles (exploded distinct +
    * 64-aggregate groupBy) computing the same numbers. */
  private def portableSigAndBands(df: DataFrame, idCol: String,
                                  textCol: String, nBands: Int,
                                  rowsPerBand: Int): (DataFrame, DataFrame) = {
    val nH = nBands * rowsPerBand
    val toks = df.repartition(col(idCol))
      .select(col(idCol), split(col(textCol), " ").as("w"))
    val hsCol = org.apache.spark.sql.GraftShims.column(
      graft.functions.PortableNgramHashes(
        org.apache.spark.sql.GraftShims.expression(col("w")), 3))
    val sig = toks.select(col(idCol), hsCol.as("hs"))
      .filter(size(col("hs")) > 0) // <3-word docs have no shingles
      .select(col(idCol), col("hs"), org.apache.spark.sql.GraftShims.column(
        graft.functions.PortableMinHashMins(
          org.apache.spark.sql.GraftShims.expression(col("hs")), nH)).as("mm"))
      .localCheckpoint(false)
    // band bucket = Σ m_{b·r+k} · 31^(r−1−k): max < 2^31 · 31^3 < 2^46
    val bandCols = (0 until nBands).map { b =>
      val bh = (0 until rowsPerBand).map { k =>
        element_at(col("mm"), b * rowsPerBand + k + 1) *
          lit(math.pow(31, rowsPerBand - 1 - k).toLong)
      }.reduce(_ + _)
      struct(lit(b).as("band"), bh.as("bh"))
    }
    val bands = sig.select(col(idCol),
        explode(array(bandCols: _*)).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.bh").as("bh"))
    (sig, bands)
  }

  /** Exact-Jaccard verification of (a_id, b_id) candidates against the two
    * signature frames' portable hash sets. */
  private def verifyCandidates(cand: DataFrame, sigA: DataFrame,
                               sigB: DataFrame, idCol: String,
                               threshold: Double): DataFrame = {
    val common = org.apache.spark.sql.GraftShims.column(
      graft.functions.SortedIntersectCount(
        org.apache.spark.sql.GraftShims.expression(col("sa")),
        org.apache.spark.sql.GraftShims.expression(col("sb"))))
    cand
      .join(sigA.select(col(idCol).as("a_id"), col("hs").as("sa")), Seq("a_id"))
      .join(sigB.select(col(idCol).as("b_id"), col("hs").as("sb")), Seq("b_id"))
      .withColumn("common", common)
      .withColumn("jaccard",
        col("common") / (size(col("sa")) + size(col("sb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** SimHash near-dup pairs on the portable hash family: 60-bit signature
    * (one vote per bit of each distinct unigram's md5-derived hash), same
    * pigeonhole banding as `simhashPairs`. Verified output — (a, b, hamming)
    * with hamming ≤ maxHamming — equals the naive all-pairs scan, which is
    * exactly what the DuckDB oracle runs. */
  def simhashPairsPortable(df: DataFrame, idCol: String, textCol: String,
                           maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 60, "maxHamming must be in [0, 60)")
    // one codegen pass per row: distinct md5-60bit word hashes + the 60
    // majority votes (graft.functions.PortableSimHash60) — replaces the
    // exploded-distinct + 60-aggregate vote pipeline, identical bits
    val sigs = df.repartition(col(idCol))
      .select(col(idCol), org.apache.spark.sql.GraftShims.column(
        graft.functions.PortableSimHash60(
          org.apache.spark.sql.GraftShims.expression(
            split(col(textCol), " ")))).as("sim"))
      .localCheckpoint(false)
    val blocks = sigs
      .select(col(idCol), col("sim"),
        explode(simhashBands(col("sim"), maxHamming)).as("b"))
      .select(col(idCol), col("sim"), col("b.blk").as("blk"), col("b.bits").as("bits"))
    blocks.select(col(idCol).as("a_id"), col("sim").as("sa"), col("blk"), col("bits"))
      .join(blocks.select(col(idCol).as("b_id"), col("sim").as("sb"), col("blk"), col("bits")),
        Seq("blk", "bits"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming").distinct()
  }

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val hashed = df.repartition(col(idCol))
      .select(col(idCol), org.apache.spark.sql.GraftShims.column(
        graft.functions.NgramHashes(
          org.apache.spark.sql.GraftShims.expression(split(col(textCol), " ")), 1)).as("hs"))
    val simhash = org.apache.spark.sql.GraftShims.column(
      graft.functions.SimHash64(
        org.apache.spark.sql.GraftShims.expression(col("hs"))))
    val sigs = hashed.select(col(idCol), simhash.as("sim")).localCheckpoint(false)
    val blocks = sigs
      .select(col(idCol), col("sim"),
        explode(simhashBands(col("sim"), maxHamming)).as("b"))
      .select(col(idCol), col("sim"), col("b.blk").as("blk"), col("b.bits").as("bits"))
    blocks.select(col(idCol).as("a_id"), col("sim").as("sa"), col("blk"), col("bits"))
      .join(blocks.select(col(idCol).as("b_id"), col("sim").as("sb"), col("blk"), col("bits")),
        Seq("blk", "bits"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming").distinct()
  }

  /** Canonical-document selection — the step that turns a duplicate-cluster
    * labelling into a deduplicated corpus: per cluster keep exactly one
    * survivor, the row ranking first under `orderBy` (e.g. longest text,
    * then smallest id as the deterministic tie-break). Returns the KEPT
    * rows: (cluster, id, orderBy cols…) — singletons (their own cluster
    * label) survive trivially, so output cardinality = number of clusters.
    *
    * 100 TB shape: one join of the cluster labels against the doc
    * attributes (id-keyed, co-partitionable with the labelling's own
    * output), then [[graft.plans.TopK.perKey]] — bounded per-partition
    * heaps on a single shuffle by cluster, no global sort, no
    * full-partition window however large the biggest cluster is. */
  def canonicalPerCluster(clusters: DataFrame, docs: DataFrame, idCol: String,
                          orderBy: Seq[(String, Boolean)]): DataFrame = {
    val attrs = orderBy.map(_._1)
    val joined = clusters.select(col(idCol), col("cluster"))
      .join(docs.select((idCol +: attrs).map(col): _*), idCol)
    graft.plans.TopK.perKey(joined, Seq("cluster"),
      orderBy :+ (idCol -> true), 1)
      .select(("cluster" +: idCol +: attrs).map(col): _*)
  }

  /** ASYMMETRIC containment pairs: (contained, container) where
    * |shingles(a) ∩ shingles(b)| ≥ `threshold` · |shingles(a)| — the
    * quote/excerpt/subset-duplicate detector that symmetric Jaccard (q55)
    * misses: a paragraph lifted into a much longer document has low
    * Jaccard but containment ≈ 1. Shingles are distinct word-`n`-grams;
    * direction is smaller-set-into-larger (ties broken by id), so each
    * unordered pair is emitted at most once.
    *
    * Candidates come from the shingle equi-join; `maxDf` drops shingles
    * shared by more than that many documents BEFORE the join (a
    * stop-phrase shingle shared by d docs would emit d² rows on one
    * shuffle key). Unlike PPJoin's lossless prefix bound, the df cap IS
    * the declared semantics — boilerplate phrases stop being containment
    * evidence — and the oracle replays it. Shingles are carried as their
    * portable 60-bit md5 hash from the moment they are generated, so
    * every shuffle (df, pair join, size join-backs) moves 8-byte longs
    * instead of ~n-word strings (the q107 hash≡string-join equivalence,
    * here at the FULL 60 bits — no mod-P fold — so a collision needs
    * ~2^30 distinct shingles; the oracle replays the same md5).
    * 100 TB: both join sides shuffle once on the hash; pair volume is
    * Σ_s df(s)² ≤ maxDf · Σ_s df(s), linear in corpus size at fixed
    * maxDf.
    *
    * Output: contained_id, container_id, inter, size_a (contained's
    * distinct-shingle count), size_b.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double, n: Int = 5,
                       maxDf: Int = 50): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    // token arrays materialized before the gram lambda, and sub-n-token
    // docs short-circuited to an empty gram set — the portableGramHashes
    // discipline (CollapseProject would otherwise inline split() into
    // every lambda element = O(tokens²), and sequence(1, size-4) on a
    // short doc would generate the DESCENDING [1,0] and evaluate the
    // invalid element_at(ws, 0))
    val toks = df.repartition(col(idCol))
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__ws"))
      .localCheckpoint(false)
    val grams =
      when(size(col("__ws")) >= n,
        array_distinct(transform(sequence(lit(1), size(col("__ws")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("__ws"), i + k)): _*))))
        .otherwise(array().cast("array<string>"))
    val sh = toks.select(col("__id"), explode(grams).as("__g"))
      .select(col("__id"), portableHash60(col("__g")).as("s"))
    // per-doc distinct-shingle count straight off the (checkpointed) gram
    // array: grams is already array_distinct, so size(grams) == the row
    // count `sh.groupBy(__id)` would aggregate — but map-only, with no
    // second explode+hash execution of `sh` and no groupBy shuffle
    // (sz rows for gram-less docs are inner-joined away below, exactly as
    // their absence from `sh` dropped them before)
    val sz = toks.select(col("__id"), size(grams).cast("long").as("sz"))
    val good = sh.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("s")))
      .where(col("df") <= maxDf).drop("df")
    val pairs = good.select(col("__id").as("a_id"), col("s"))
      .join(good.select(col("__id").as("b_id"), col("s")), Seq("s"))
      .where(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    pairs
      .join(sz.select(col("__id").as("a_id"), col("sz").as("size_a")), Seq("a_id"))
      .join(sz.select(col("__id").as("b_id"), col("sz").as("size_b")), Seq("b_id"))
      .where((col("size_a") < col("size_b")) ||
             (col("size_a") === col("size_b") && col("a_id") < col("b_id")))
      .where(col("inter").cast("double") >= lit(threshold) * col("size_a").cast("double"))
      .select(col("a_id").as("contained_id"), col("b_id").as("container_id"),
        col("inter"), col("size_a"), col("size_b"))
  }

  /** Exact duplicated-SPAN detection across documents — the suffix-style
    * dedup family ("Deduplicating Training Data Makes Language Models
    * Better"-shaped: verbatim k-token-plus overlaps embedded in otherwise
    * different documents, which document-level MinHash/SimHash passes
    * miss). Re-expressed as a bucket join, NEVER a suffix array on the
    * driver:
    *
    *  1. one ANCHOR per k-token window position per document:
    *     (id, pos, h) with h the portable md5 hash of the window text —
    *     generated by the single-pass PortableNgramPosHashes expression
    *     ([[anchorRows]]), which evaluates split() once per row by
    *     construction (the lambda formulation needed a localCheckpoint
    *     to dodge CollapseProject's O(tokens²) split() inlining);
    *  2. a window repeated WITHIN a document keeps its first position
    *     (min pos): anchors stay ≤ token count per doc, and diagonal
    *     runs stay well-defined on repetitive text — the cost is that a
    *     cross-doc span whose interior window also occurred earlier in
    *     the same doc splits into shorter reported runs (conservative:
    *     max_span_tokens never over-reports);
    *  3. stop-window guard: windows in more than `maxDf` documents are
    *     dropped (boilerplate headers — the PPJoin prefix-filter
    *     discipline), single-document windows can't pair and are
    *     dropped too, so the candidate join is a plain (h) equi shuffle
    *     with pair volume Σ_h df(h)² ≤ maxDf · Σ_h df(h) — linear in
    *     corpus size at fixed maxDf;
    *  4. BOUNDED in-bucket extension: matched anchors of a pair on the
    *     same diagonal (pa − pb) with consecutive positions are one
    *     duplicated span of run + k − 1 tokens — one window partitioned
    *     by (pair, diagonal), never global.
    *
    * Output per (a_id < b_id) pair: n_anchors (matched k-windows),
    * n_spans (maximal diagonal runs), max_span_tokens. */
  def sharedSpanPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int, maxDf: Int = 64): DataFrame = {
    require(k >= 2 && k <= 64, s"anchor width k must be in [2, 64], got $k")
    require(maxDf >= 2, "maxDf must allow at least one pair")
    import org.apache.spark.sql.expressions.Window
    // one digest per k-token window: spread the batch anchor kernel
    // (anchorRows itself stays un-spread — it is the stream-safe entry)
    val anchors = anchorRows(graft.Db.spread(df), idCol, textCol, k)
      .select(col(idCol).as("__id"), col("p").as("__p"), col("h").as("__h"))
      .groupBy("__id", "__h").agg(min(col("__p")).as("__p"))
    val eligible = anchors.groupBy("__h").agg(count(lit(1)).as("__df"))
      .where(col("__df") >= 2 && col("__df") <= maxDf)
      .select("__h")
    val keyed = anchors.join(eligible, Seq("__h"))
    val pairs = keyed
      .select(col("__h"), col("__id").as("a_id"), col("__p").as("__pa"))
      .join(keyed.select(col("__h"), col("__id").as("b_id"),
        col("__p").as("__pb")), Seq("__h"))
      .where(col("a_id") < col("b_id"))
    // positions within (pair, diagonal) are distinct (one window per doc
    // position after the min-pos dedup), so the island id is deterministic
    val runs = pairs
      .withColumn("__d", col("__pa") - col("__pb"))
      .withColumn("__isl", col("__pa") - row_number().over(
        Window.partitionBy("a_id", "b_id", "__d").orderBy("__pa")))
      .groupBy("a_id", "b_id", "__d", "__isl")
      .agg(count(lit(1)).as("__run"))
    runs.groupBy("a_id", "b_id")
      .agg(sum(col("__run")).as("n_anchors"),
        count(lit(1)).as("n_spans"),
        (max(col("__run")) + (k - 1)).as("max_span_tokens"))
  }

  /** EVERY k-token window of each document as an anchor row
    * (idCol, p, h): 0-based window position + the full 60-bit portable
    * md5 hash of the window text — the span-dedup family's shared
    * candidate generator ([[sharedSpanPairs]] batch pairing,
    * CorpusStreams.spanContaminated at ingest). A single-pass codegen
    * expression per row (no token-array checkpoint, no per-document
    * state), so it is STREAM-SAFE: a streaming frame explodes to anchor
    * rows micro-batch by micro-batch. Sub-k-token documents emit
    * nothing. */
  def anchorRows(df: DataFrame, idCol: String, textCol: String,
                 k: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"anchor width k must be in [2, 64], got $k")
    val windows = org.apache.spark.sql.GraftShims.column(
      graft.functions.PortableNgramPosHashes(
        org.apache.spark.sql.GraftShims.expression(split(col(textCol), " ")), k))
    df.select(col(idCol), explode(windows).as("__a"))
      .select(col(idCol), col("__a.p").as("p"), col("__a.h").as("h"))
  }

  /** MOSS-style WINNOWING fingerprints (Schleimer, Wilkerson, Aiken,
    * SIGMOD'03): the rolling k-token window hashes ([[anchorRows]])
    * reduced to the MINIMUM hash of every w consecutive windows — the
    * classic document fingerprint that GUARANTEES any shared run of
    * k + w − 1 tokens contributes at least one common fingerprint,
    * at ~1/w the anchor volume (the density/guarantee trade the paper
    * proves optimal). One per-document window (bounded by document
    * length — the per-doc window discipline) + a distinct; documents
    * with fewer than k + w − 1 tokens have no full window and emit
    * nothing. Output: (idCol, fp) distinct rows — join two corpora on
    * fp for sub-quadratic overlap candidates, or store as the compact
    * dedup signature. */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 8, w: Int = 4): DataFrame = {
    require(w >= 1 && w <= 256, s"winnow width w must be in [1, 256], got $w")
    import org.apache.spark.sql.expressions.Window
    val a = anchorRows(graft.Db.spread(df), idCol, textCol, k)
    val perDoc = Window.partitionBy(col(idCol))
    a.withColumn("__n", count(lit(1)).over(perDoc))
      .withColumn("fp", min(col("h")).over(
        perDoc.orderBy(col("p")).rowsBetween(0, w - 1)))
      .where(col("p") <= col("__n") - w)
      .select(col(idCol), col("fp")).distinct()
  }

  /** The quarantine-side artifact for span decontamination: ONE row per
    * distinct k-token-window hash of the given corpus (a benchmark set,
    * known-leaked spans, a previous [[sharedSpanPairs]] sweep's flagged
    * documents). Build once, persist, join every ingest batch against it
    * — the q176 stream-static shape with q284's anchor family. */
  def spanAnchorTable(df: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame =
    anchorRows(graft.Db.spread(df), idCol, textCol, k)
      .select(col("h")).distinct()
}
