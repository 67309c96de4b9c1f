package graft.queries

import graft.Db
import graft.Db.dec
import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Training-data-pipeline operator gates, round 3: second columnar format
  * (ORC), reproducible hash-based splits and stratified sampling, regex
  * scrubbing, repetition-ratio quality scoring, power-of-two length
  * histograms, bucketed-table joins and hive-partitioned layouts. Every gate
  * carries an exact DuckDB oracle on the same inputs.
  */
object Pipeline {

  private val orcPath = "/tmp/graft_orc/supplier"
  private val partPath = "/tmp/graft_part/documents"

  val all: Seq[Q] = Seq(
    // --- q97: ORC sink + source roundtrip — values must survive the format
    //     change bit-exactly, so the oracle reads the original parquet
    Q("q97_orc_source", Some(s"""
      SELECT s_nationkey, count(*) AS n,
             CAST(sum(${DEC("s_acctbal")}) AS DOUBLE) AS sum_bal
      FROM supplier GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        graft.sources.Orc.save(Db(s, dir).supplier, orcPath)
        graft.sources.Orc.load(s, orcPath)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"),
            sum(dec(col("s_acctbal"))).cast("double").as("sum_bal"))
          .orderBy("s_nationkey")
      }),

    // --- q98: reproducible train/val/test split via content-stable md5
    //     buckets (NOT rand(): reruns, repartitions, and the oracle engine
    //     must all agree on every row's assignment)
    Q("q98_hash_split", Some("""
      WITH b AS (
        SELECT *, ('0x' || substring(md5(doc_id::VARCHAR), 1, 6))::BIGINT % 100 AS bucket
        FROM documents),
      s AS (SELECT *, CASE WHEN bucket < 80 THEN 'train'
                           WHEN bucket < 90 THEN 'val'
                           ELSE 'test' END AS split FROM b)
      SELECT split, count(*) AS n, min(doc_id) AS min_id,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM s GROUP BY 1 ORDER BY 1"""),
      (s, dir) =>
        Corpus.hashSplit(Db(s, dir).documents, col("doc_id"))
          .groupBy("split")
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("split")),

    // --- q99: regex scrub (PII-redaction shape) over the events props JSON
    Q("q99_regex_scrub", Some("""
      SELECT regexp_replace(props, '[0-9]+', '#', 'g') AS scrubbed,
             count(*) AS n, min(event_id) AS min_id, max(event_id) AS max_id
      FROM events GROUP BY 1 ORDER BY 1"""),
      (s, dir) =>
        Corpus.scrub(Db(s, dir).events, "props", "[0-9]+", "#")
          .groupBy(col("props").as("scrubbed"))
          .agg(count(lit(1)).as("n"), min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
          .orderBy("scrubbed")),

    // --- q100: repetition ratio (most-repeated-word share) — the cheap
    //     boilerplate/spam quality signal, exact per-doc values
    Q("q100_repetition_ratio", Some("""
      WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents WHERE doc_id < 300),
      f AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2)
      SELECT doc_id,
             round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT), 4) AS rep_ratio
      FROM f GROUP BY 1 ORDER BY 1"""),
      (s, dir) =>
        Corpus.repetitionRatio(
            Db(s, dir).documents.filter(col("doc_id") < 300), "doc_id", "text")
          .select(col("doc_id"), round(col("rep_ratio"), 4).as("rep_ratio"))
          .orderBy("doc_id")),

    // --- q101: deterministic stratified sampling — per-stratum hash-bucket
    //     rates (20% of English docs, 10% of everything else)
    Q("q101_stratified_sample", Some("""
      SELECT lang, count(*) AS n, min(doc_id) AS min_id,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents
      WHERE ('0x' || substring(md5(doc_id::VARCHAR || ':' || lang), 1, 6))::BIGINT % 100
            < CASE WHEN lang = 'en' THEN 20 ELSE 10 END
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) =>
        Corpus.stratifiedSample(Db(s, dir).documents, "lang",
            concat(col("doc_id").cast("string"), lit(":"), col("lang")),
            Map("en" -> 20), defaultPct = 10)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("lang")),

    // --- q102: power-of-two document-length histogram; the bucket is
    //     length(bin(n)) = floor(log2 n)+1, computed in INTEGER domain on
    //     both engines (float log2 at exact powers of two is an ulp trap)
    Q("q102_length_histogram", Some("""
      SELECT lang, CAST(length(bin(n_chars)) AS INT) AS len_bucket,
             count(*) AS n
      FROM documents WHERE n_chars > 0
      GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, dir) =>
        Db(s, dir).documents.filter(col("n_chars") > 0)
          .groupBy(col("lang"), length(bin(col("n_chars"))).as("len_bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "len_bucket")),

    // --- q103: bucketed-table join — both sides pre-bucketed on the join
    //     key, so the join runs with NO shuffle exchange (the cluster-scale
    //     analog of the reference's hash index, /root/reference/src/indexing/
    //     Indexer.java:23-37; exchange-freeness asserted in SourcesSpec);
    //     results must equal the plain parquet join
    Q("q103_bucketed_join", Some(s"""
      SELECT n_name, count(*) AS n,
             CAST(sum(${DEC("s_acctbal")}) AS DOUBLE) AS sum_bal
      FROM nation, supplier WHERE n_nationkey = s_nationkey
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val d = Db(s, dir)
        graft.GraftSession.writeBucketed(
          d.nation.select("n_nationkey", "n_name"), "graft_q103_nation",
          "n_nationkey", 8)
        graft.GraftSession.writeBucketed(
          d.supplier.select("s_nationkey", "s_acctbal"), "graft_q103_supplier",
          "s_nationkey", 8)
        s.table("graft_q103_nation")
          .join(s.table("graft_q103_supplier"),
            col("n_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"),
            sum(dec(col("s_acctbal"))).cast("double").as("sum_bal"))
          .orderBy("n_name")
      }),

    // --- q104: hive-partitioned layout — write partitioned by lang, read
    //     back with a partition filter (pruned directory scan), aggregate;
    //     the oracle runs the same filter over the original table
    Q("q104_partitioned_scan", Some("""
      SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents WHERE lang = 'en'
      GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        Db(s, dir).documents.write.mode("overwrite")
          .partitionBy("lang").parquet(partPath)
        s.read.parquet(partPath)
          .filter(col("lang") === "en")
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      })
  )
}
