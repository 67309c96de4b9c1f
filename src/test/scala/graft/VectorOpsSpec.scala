package graft

class VectorOpsSpec extends SparkSpec {

  test("brute-force ANN returns k descending cosine scores in [-1, 1]") {
    val rows = run("q60_ann_bruteforce").collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Double]("cos_sim"))
    assert(scores.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("LSH ANN candidates carry true cosine scores (subset of brute force ranking)") {
    val bf = run("q60_ann_bruteforce").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    val lsh = run("q61_ann_lsh").collect()
    assert(lsh.nonEmpty, "multi-table LSH should surface at least one candidate")
    lsh.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      // any LSH hit that is also in the brute-force top-10 must agree on score
      bf.get(id).foreach(s => assert(math.abs(s - r.getAs[Double]("cos_sim")) < 1e-9))
    }
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    run("q59_embedding_neardup").collect().foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Double]("cos_sim") >= 0.4 - 1e-4)
    }
  }

  test("per-label stats cover all labels with sane norms") {
    val rows = run("q63_vector_stats").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Double]("min_norm") <= r.getAs[Double]("avg_norm") + 1e-9)
      assert(r.getAs[Double]("avg_norm") <= r.getAs[Double]("max_norm") + 1e-9)
    }
  }
}
