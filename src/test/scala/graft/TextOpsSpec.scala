package graft

import graft.queries.TextOps

class TextOpsSpec extends SparkSpec {

  test("exact dedup accounts for every document") {
    val rows = run("q50_dedup_exact").collect()
    assert(rows.map(_.getAs[Long]("n_copies")).sum == Db(spark, sf).documents.count())
  }

  test("MinHash-LSH near-dup pairs are a high-recall subset of exact Jaccard pairs") {
    val exact = run("q55_ngram_jaccard_dedup").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val lsh = run("q56_minhash_lsh_dedup").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(lsh.subsetOf(exact), "LSH verification must enforce the exact threshold")
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.8,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("cross-corpus LSH finds planted near-dups between sides, never within") {
    import graft.operators.TextDedup
    val session = spark
    import session.implicits._
    val left = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different text about spark engines and joins here"),
      (3L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("id", "body")
    val right = Seq(
      (10L, "the quick brown fox jumps over the lazy dog yesterday"),
      (11L, "unrelated words nothing shared with anything else at all"))
      .toDF("id", "body")
    val got = TextDedup.crossCorpusLshPairsPortable(left, right, "id", "body", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard"))
      .toMap
    // 10-word twins differing in the last word: 7 of 9 distinct shingles
    // shared → j = 7/9; both left copies must pair with the right twin
    assert(got.keySet == Set((1L, 10L), (3L, 10L)))
    got.values.foreach(j => assert(math.abs(j - 7.0 / 9.0) < 1e-9))
    // within-side duplicates (1,3) are NOT the operator's business
    assert(!got.keySet.exists { case (a, b) => a < 10 && b < 10 })
  }

  test("q173 gate pairs always bridge train (non-src0) to eval (src0)") {
    val docs = Db(spark, sf).documents
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    run("q173_fuzzy_decontamination").collect().foreach { r =>
      assert(docs(r.getAs[Long]("a_id")) != "src0")
      assert(docs(r.getAs[Long]("b_id")) == "src0")
      assert(r.getAs[Double]("jaccard") >= 0.3)
    }
  }

  test("SimHash pairs respect the hamming bound and ordering convention") {
    val rows = run("q57_simhash_dedup").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Int]("hamming") <= 3)
    }
  }

  test("language ID predicts a known language label") {
    val rows = run("q54_lang_id").collect()
    val langs = TextOps.stopwords.keySet + "en"
    rows.foreach(r => assert(langs.contains(r.getAs[String]("pred_lang"))))
  }

  test("TextDedup operators are table-agnostic (arbitrary id/text columns)") {
    import graft.operators.TextDedup
    val session = spark
    import session.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d x"),
      (4L, "z y w v u")).toDF("id", "body")
    val ex = TextDedup.exact(df, "id", "body").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ex(1L) == 2 && ex(3L) == 1 && ex(4L) == 1)
    val jp = TextDedup.jaccardPairs(df, "id", "body", 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(jp((1L, 2L)) == 1.0)
    assert(math.abs(jp((1L, 3L)) - 0.5) < 1e-9) // 2 common of 4 distinct shingles
    assert(!jp.contains((1L, 4L)))
    val mh = TextDedup.minhashLshPairs(df, "id", "body", 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(jp.keySet))
    assert(mh.contains((1L, 2L))) // identical texts always collide in every band
    // clustering works for NON-numeric id columns too (labels keep the
    // column's own type)
    import org.apache.spark.sql.functions.{concat, lit => slit, col => scol}
    val sdf = df.select(concat(slit("d"), scol("id")).as("sid"), scol("body"))
    val cl = TextDedup.duplicateClusters(sdf, "sid",
        TextDedup.jaccardPairs(sdf, "sid", "body", 0.4))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cl == Map("d1" -> "d1", "d2" -> "d1", "d3" -> "d1", "d4" -> "d4"))
  }

  test("banded SimHash pairs equal the naive all-pairs scan (pigeonhole is lossless)") {
    import org.apache.spark.sql.functions._
    val docs = Db(spark, sf).documents
    val banded = graft.operators.TextDedup.simhashPairs(docs, "doc_id", "text", 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))).toSet
    // naive reference: cross product + hamming filter
    val hashed = docs.select(col("doc_id"),
      transform(array_distinct(split(col("text"), " ")), w => xxhash64(w)).as("hs"))
    val sig = org.apache.spark.sql.GraftShims.column(
      graft.functions.SimHash64(org.apache.spark.sql.GraftShims.expression(col("hs"))))
    val sigs = hashed.select(col("doc_id"), sig.as("sim"))
    val naive = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
      .filter(col("hamming") <= 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))).toSet
    assert(banded == naive)
  }

  test("prefix-filtered Jaccard equals the naive all-shingles join") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextDedup
    val docs = Db(spark, sf).documents
    val fast = TextDedup.jaccardPairs(docs, "doc_id", "text", 0.3)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // naive reference: unfiltered self-join on every shingle
    val ds = TextDedup.shingleRows(docs, "doc_id", "text")
      .withColumn("nsh", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val a = ds.select(col("doc_id").as("a_id"), col("nsh").as("na"), col("s"))
    val b = ds.select(col("doc_id").as("b_id"), col("nsh").as("nb"), col("s"))
    val naive = a.join(b, Seq("s")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("common"), max("na").as("na"), max("nb").as("nb"))
      .withColumn("j", round(col("common") / (col("na") + col("nb") - col("common")), 4))
      .filter(col("common") / (col("na") + col("nb") - col("common")) >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("j"))).toSet
    assert(fast == naive)
  }

  test("near-dup candidate plans avoid cartesian products") {
    for (q <- Seq("q55_ngram_jaccard_dedup", "q57_simhash_dedup")) {
      val physical = run(q).queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"),
        s"$q plan must be shuffle-keyed, got:\n$physical")
    }
  }

  test("prefix pruning is lossless at floating-point boundary thresholds") {
    // t=0.4, na=3, nb=4, overlap=2 -> Jaccard exactly 2/5 = 0.4 (qualifies).
    // The exact overlap bound is ceil(2/7*7)=2, but double 0.4/1.4 rounds
    // ABOVE 2/7, so a naive ceil gives 3 and would prune the pair whenever
    // its shared shingles sit late in the rarity order (they do here: the
    // shared shingles have doc-frequency 2, the unique ones 1).
    import graft.operators.TextDedup
    val session = spark
    import session.implicits._
    val df = Seq((1L, "a b c d e"),          // shingles: abc, bcd, cde
                 (2L, "x a b c d f")).toDF("id", "body") // xab, abc, bcd, cdf
    val pairs = TextDedup.jaccardPairs(df, "id", "body", 0.4).collect()
    assert(pairs.length == 1, s"boundary pair pruned: got ${pairs.mkString(";")}")
    assert(math.abs(pairs(0).getAs[Double]("jaccard") - 0.4) < 1e-12)
  }

  test("duplicate clusters: pair endpoints share a cluster led by its min member") {
    val clusters = run("q91_dedup_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(clusters.size == Db(spark, sf).documents.count())
    // every near-dup pair must be in the same cluster
    run("q55_ngram_jaccard_dedup").collect().foreach { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // the cluster label is the smallest member of the cluster
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
    }
  }

  test("token counts are consistent: unique <= total, regex words <= chars") {
    run("q52_token_count").collect().foreach { r =>
      assert(r.getAs[Int]("n_unique") <= r.getAs[Int]("n_tokens"))
      assert(r.getAs[Int]("n_words_re") <= r.getAs[Int]("len_chars"))
    }
  }
}
