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

  test("SimHash pairs respect the hamming bound and ordering convention") {
    val rows = run("q57_simhash_dedup").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Int]("hamming") <= 12)
    }
  }

  test("language ID predicts a known language label") {
    val rows = run("q54_lang_id").collect()
    val langs = TextOps.stopwords.keySet + "en"
    rows.foreach(r => assert(langs.contains(r.getAs[String]("pred_lang"))))
  }

  test("token counts are consistent: unique <= total, regex words <= chars") {
    run("q52_token_count").collect().foreach { r =>
      assert(r.getAs[Int]("n_unique") <= r.getAs[Int]("n_tokens"))
      assert(r.getAs[Int]("n_words_re") <= r.getAs[Int]("len_chars"))
    }
  }
}
