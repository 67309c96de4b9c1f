package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referential-integrity audit: for each declared foreign key, count the
  * child rows whose key has no parent — the join-health check a pipeline
  * runs after ingesting/compacting related tables (a non-zero orphan
  * count means downstream inner joins silently DROP those rows, skewing
  * whatever is trained on the join result).
  *
  * 100 TB shape: each FK costs one aggregated left join — the parent
  * side is reduced to its DISTINCT key column first (so a 100 TB parent
  * contributes only its key cardinality, broadcastable for dimension
  * tables), and the orphan count aggregates map-side. NULL child keys are
  * reported separately (n_null_keys): a NULL FK is "unknown", not an
  * orphan — both SQL semantics (NULL never equals) and pipeline triage
  * (missing field vs dangling reference) distinguish them.
  */
object Audit {

  /** One audited foreign key: child rows referencing a parent key. */
  final case class Fk(name: String, child: DataFrame, childKey: String,
                      parent: DataFrame, parentKey: String)

  /** Audit all `fks`: (fk, n_child, n_null_keys, n_orphans) — one row per
    * declared key, n_orphans counting non-null child keys absent from the
    * parent's key set. */
  def refIntegrity(fks: Seq[Fk]): DataFrame = {
    require(fks.nonEmpty, "need at least one foreign key to audit")
    fks.map { fk =>
      val pk = fk.parent.select(col(fk.parentKey).as("__pk")).distinct()
      fk.child.select(col(fk.childKey).as("__ck"))
        .join(pk, col("__ck") === col("__pk"), "left")
        .agg(
          count(lit(1)).as("n_child"),
          // count(when), not sum(when): BIGINT on both engines (DuckDB's
          // sum() widens to HUGEINT)
          count(when(col("__ck").isNull, lit(1))).as("n_null_keys"),
          count(when(col("__ck").isNotNull && col("__pk").isNull, lit(1)))
            .as("n_orphans"))
        .select(lit(fk.name).as("fk"), col("n_child"), col("n_null_keys"),
          col("n_orphans"))
    }.reduce(_ union _)
  }

  /** Fact-to-detail reconciliation: does every header's stated total
    * equal its detail roll-up within `tolCents`? The value-consistency
    * companion to [[refIntegrity]]'s key-consistency check (orphan-free
    * keys can still carry corrupted amounts). All arithmetic in exact
    * integer cents — header total and detail sum are compared as
    * BIGINTs, never floats. One detail aggregation (map-side partial on
    * the header key) + one join + one summary row: (n_headers,
    * n_headerless, n_mismatched, max_abs_diff_cents,
    * sum_abs_diff_cents). `n_headerless` counts headers with NO detail
    * rows (reported, not treated as diff-0 matches). */
  def reconcile(headers: DataFrame, headerKey: String, totalCents: Column,
                details: DataFrame, detailKey: String, amountCents: Column,
                tolCents: Long = 1L): DataFrame = {
    val h = headers.select(col(headerKey).as("__k"),
      totalCents.cast("long").as("__t"))
    val d = details.select(col(detailKey).as("__k"),
        amountCents.cast("long").as("__a"))
      .groupBy("__k").agg(sum(col("__a")).as("__s"))
    h.join(d, Seq("__k"), "left")
      .withColumn("__diff",
        when(col("__s").isNotNull, abs(col("__t") - col("__s"))))
      .agg(count(lit(1)).as("n_headers"),
        count(when(col("__s").isNull, 1)).as("n_headerless"),
        count(when(col("__diff") > tolCents, 1)).as("n_mismatched"),
        coalesce(max(col("__diff")), lit(0L)).as("max_abs_diff_cents"),
        coalesce(sum(col("__diff")), lit(0L)).as("sum_abs_diff_cents"))
  }

  /** Per-key integer-sequence completeness audit — offsets, invoice
    * numbers, line numbers: is each key's sequence contiguous, and if
    * not, how much is missing or duplicated? The ingestion-health check
    * behind "did we drop a Kafka offset range?" / "are line numbers
    * dense?".
    *
    * One (key, value) hash aggregation (dedupe + per-value dup count),
    * one lag window per key for the largest hole, one reduce — shuffle
    * keyed by the audited key, no self-join. A NULL sequence value is
    * the corrupt-ingest case this audit exists for: it is counted in
    * `n_nulls` (and n_rows) and kept OUT of the value set — folding it
    * in would corrupt `missing` (min/max skip NULLs while a bare
    * count(*) wouldn't, yielding negative gaps). Output per key:
    * keyCols ++ (n_rows, n_nulls, n_values, lo, hi, missing, dupes,
    * max_gap) where missing = (hi−lo+1) − n_values over the NON-NULL
    * values and max_gap is the widest run of absent values between two
    * present ones (0 when contiguous). */
  def sequenceGaps(df: DataFrame, keyCols: Seq[String],
                   seq: Column): DataFrame = {
    val g = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__s"))
    df.select(g :+ seq.cast("long").as("__s"): _*)
      .groupBy(g :+ col("__s"): _*).agg(count(lit(1)).as("__c"))
      // NULL sorts first ASC, so the first real value's lag is the NULL
      // row's NULL __s → its gap is NULL and max() skips it
      .withColumn("__gap", col("__s") - lag(col("__s"), 1).over(w) - 1)
      .groupBy(g: _*)
      .agg(sum(col("__c")).as("n_rows"),
        coalesce(sum(when(col("__s").isNull, col("__c"))), lit(0L))
          .as("n_nulls"),
        count(col("__s")).as("n_values"),
        min(col("__s")).as("lo"),
        max(col("__s")).as("hi"),
        (max(col("__s")) - min(col("__s")) + 1 - count(col("__s")))
          .as("missing"),
        (coalesce(sum(when(col("__s").isNotNull, col("__c"))), lit(0L)) -
          count(col("__s"))).as("dupes"),
        coalesce(max(col("__gap")), lit(0L)).as("max_gap"))
  }

  /** Double-event (near-duplicate transaction) detector: pairs of rows
    * with the SAME key and amount within `windowMicros` of each other —
    * the double-charge / double-fire audit. NEVER an all-pairs or
    * time-range nested loop: each row joins only its (key, amount,
    * time-bucket) cell, with the left side exploded to its own and the
    * NEXT bucket so every qualifying pair is met exactly once (same
    * bucket, or adjacent buckets) — a pure equi shuffle whose cost
    * follows the true collision mass. Pairs are ordered (a before b by
    * ts, then tie) and verified exactly on the microsecond gap.
    * Output: keyCols ++ (amount, a_id, b_id, gap_micros). */
  def doubleEvents(df: DataFrame, keyCols: Seq[String], tsMicros: Column,
                   tie: Column, amount: Column,
                   windowMicros: Long): DataFrame = {
    require(windowMicros >= 1, "window must be >= 1 microsecond")
    val g = keyCols.map(col)
    val e = df.select(g :+ amount.as("amount") :+
        tsMicros.cast("long").as("__ts") :+ tie.as("__id"): _*)
      .withColumn("__b", expr(s"__ts div $windowMicros"))
    val a = e.select(g ++ Seq(col("amount"), col("__ts").as("__ats"),
        col("__id").as("a_id"),
        explode(array(col("__b"), col("__b") + 1)).as("__jb")): _*)
    val b = e.select(g ++ Seq(col("amount"), col("__ts").as("__bts"),
        col("__id").as("b_id"), col("__b").as("__jb")): _*)
    a.join(b, keyCols ++ Seq("amount", "__jb"))
      .where((col("__bts") > col("__ats") ||
          (col("__bts") === col("__ats") && col("b_id") > col("a_id"))) &&
        col("__bts") - col("__ats") <= windowMicros)
      .select(g ++ Seq(col("amount"), col("a_id"), col("b_id"),
        (col("__bts") - col("__ats")).as("gap_micros")): _*)
  }

  /** Declarative data-contract validation: each expectation is a named
    * row-level predicate (not-null, range, set membership, regex,
    * cross-column consistency — any Column), and the report counts its
    * violations EXACTLY, in ONE scan of the table regardless of how
    * many rules are declared (each rule is one conditional-count
    * aggregate in the same map-side-partial aggregation — never a scan
    * per rule, never a collect). A NULL predicate result counts as a
    * violation: an expectation that cannot be evaluated on a row is not
    * met by it (three-valued logic would silently pass unevaluable
    * rows). An EMPTY table is a degenerate report, not a pass: every
    * rule shows passed = false with NULL pct (a dead feed is the
    * canonical failure a contract gate must not wave through —
    * vacuous truth is the wrong semantics for ingest checks). Output:
    * one row per rule, declaration order — (rule, n_rows,
    * n_violations, pct_violations round 6, passed). */
  def expectations(df: DataFrame,
                   rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    val counts = df.agg(count(lit(1)).as("n_rows"),
      rules.zipWithIndex.map { case ((_, pred), i) =>
        count(when(not(coalesce(pred, lit(false))), 1)).as(s"__v$i")
      }: _*)
    // unpivot the one result row via explode (NOT a union of selects over
    // the same aggregate — that shape invites N re-computations of the
    // scan if exchange reuse declines)
    counts.select(col("n_rows"), explode(array(
        rules.zipWithIndex.map { case ((name, _), i) =>
          struct(lit(i).as("rule_no"), lit(name).as("rule"),
            col(s"__v$i").as("n_violations"))
        }: _*)).as("__r"))
      .select(col("__r.rule_no").as("rule_no"), col("__r.rule").as("rule"),
        col("n_rows"), col("__r.n_violations").as("n_violations"),
        when(col("n_rows") > 0,
          round(col("__r.n_violations").cast("double") / col("n_rows"), 6))
          .as("pct_violations"),
        (col("__r.n_violations") === 0L && col("n_rows") > 0).as("passed"))
  }
}
