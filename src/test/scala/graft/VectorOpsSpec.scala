package graft
import org.apache.spark.sql.functions.col

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

  test("LSH near-dup pairs: exact precision, high recall vs the exact scan") {
    def pairs(q: String) = run(q).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val exact = pairs("q59_embedding_neardup")
    val lsh = pairs("q74_embedding_neardup_lsh")
    assert(lsh.subsetOf(exact), "re-rank must enforce the exact threshold")
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.8,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("nearDupPairs routes large inputs through the bucketed plan (no cartesian)") {
    import graft.operators.Similarity
    val e = Db(spark, sf).embeddings
    // force the LSH path by setting the guard below the row count
    val plan = Similarity.nearDupPairs(e, "vec_id", "embedding", 0.4, exactMaxRows = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"LSH path must be shuffle-keyed, got:\n$plan")
  }

  test("IVF ANN: probe results carry true scores; recall vs brute force") {
    val bf = run("q60_ann_bruteforce").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    val ivf = run("q78_ann_ivf").collect()
    assert(ivf.nonEmpty, "IVF probe should surface candidates")
    ivf.foreach { r =>
      bf.get(r.getAs[Long]("vec_id"))
        .foreach(s => assert(math.abs(s - r.getAs[Double]("cos_sim")) < 1e-9))
    }
    val recall = ivf.map(_.getAs[Long]("vec_id")).count(bf.contains).toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall@10 too low: $recall")
  }

  test("IVF probe is a partition-pruned scan with no assignment on the query path") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val e = Db(spark, sf).embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    val codebook = Similarity.ivfBuild(e, "vec_id", "embedding", dir, k = 8)
    assert(codebook.length == 8)
    // codebook persists beside the data and reloads exactly
    val loaded = Similarity.ivfLoadCodebook(dir)
    assert(loaded.map(_.toSeq).toSeq == codebook.map(_.toSeq).toSeq)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val probe = Similarity.ivfProbeTopK(spark, dir, "vec_id", "embedding", q,
      k = 10, nProbe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_cell"),
      s"probe must prune ivf_cell partitions, got:\n$plan")
    assert(!plan.toLowerCase.contains("nearestcentroids"),
      s"probe must not re-assign cells per row, got:\n$plan")
    assert(probe.collect().nonEmpty)
  }

  test("PQ codes compress 16x and ADC top-k recalls the exact L2 neighbors") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val e = Db(spark, sf).embeddings
    val vecs = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
        case null => 0.0
      }.toArray).toMap
    val query = vecs(0L)
    def l2sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = vecs.toSeq.filter(_._1 != 0L)
      .sortBy { case (id, v) => (l2sq(query, v), id) }.take(10).map(_._1).toSet

    val books = Similarity.pqCodebooks(e, "vec_id", "embedding")
    assert(books.length == 16 && books.forall(_.length <= 256))
    val codes = Similarity.pqEncode(
      e.filter(col("vec_id") =!= 0), "vec_id", "embedding", books)
    // compression: 64 floats -> 16 small codes (1 byte each at k<=256)
    val firstCodes = codes.orderBy("vec_id").limit(1).collect()(0).getSeq[Int](1)
    assert(firstCodes.length == 16 && firstCodes.forall(c => c >= 0 && c < 256))

    val top = Similarity.pqTopK(codes, "vec_id", query, books, 10).collect()
      .map(_.getLong(0))
    assert(top.length == 10)
    val recall = top.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall@10 too low: $recall (got ${top.toSeq})")
    // deterministic: a second run returns the identical ranking
    val again = Similarity.pqTopK(codes, "vec_id", query, books, 10).collect()
      .map(_.getLong(0))
    assert(again.toSeq == top.toSeq)
  }

  test("k-means converges to the planted 1-D split, seeds = lowest ids") {
    val session = spark
    import session.implicits._
    // seeds are vecs 0 (0.0) and 1 (0.1); round 1 pulls c1 to ~0.733, so
    // round 2 reassigns vec 1 to c0 — the hand-computed two-round dynamics
    val df = Seq(0L -> Array(0.0f), 1L -> Array(0.1f),
      2L -> Array(1.0f), 3L -> Array(1.1f)).toDF("vec_id", "embedding")
    val got = graft.operators.KMeans
      .lloydFixed(df, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("nearestCentroid scorer equals the join-based assignment, ties to low cid") {
    val session = spark
    import session.implicits._
    // map-only scorer vs lloydModel's own final assignment on the fixture
    val e = Db(spark, sf).embeddings
    val (asg, cent) = graft.operators.KMeans
      .lloydModel(e, "vec_id", "embedding", k = 8, iters = 2)
    val model = cent.collect().groupBy(_.getInt(0)).map { case (cid, rows) =>
      (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
    }.toSeq
    val scored = e.select(col("vec_id"),
        graft.operators.KMeans.nearestCentroid(col("embedding"), model)
          .as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val joined = asg.collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(scored == joined)
    // tie-break: equidistant point goes to the LOWEST cid
    val tied = Seq(9L -> Array(0.5f)).toDF("vec_id", "embedding")
      .select(graft.operators.KMeans.nearestCentroid(col("embedding"),
        Seq(1 -> Seq(0L), 0 -> Seq(1000000L))).as("c"))
      .head.getLong(0)
    assert(tied === 0L)
  }

  test("k-means assignment is partition-order-independent (exact integer math)") {
    val e = Db(spark, sf).embeddings
    val a = graft.operators.KMeans
      .lloydFixed(e, "vec_id", "embedding", k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = graft.operators.KMeans
      .lloydFixed(e.repartition(13), "vec_id", "embedding", k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    assert(a.values.toSet.size > 1, "fixture must split into several clusters")
  }

  test("k-means assignment join broadcasts the centroid side (never a dim-keyed shuffle)") {
    // joining on `dim` alone is a d-value key: a shuffle join there funnels
    // every row for one dimension onto one reducer — the explicit
    // broadcast() must pin BroadcastHashJoin into the physical plan
    val e = Db(spark, sf).embeddings
    val plan = graft.operators.KMeans
      .lloydFixed(e, "vec_id", "embedding", k = 4, iters = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"assignment plan lost the centroid broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a dim-keyed sort-merge join crept into the k-means plan:\n$plan")
    // guard rail: oversized k*d must be refused, not silently shuffled
    val err = intercept[IllegalArgumentException] {
      graft.operators.KMeans.lloydFixed(e, "vec_id", "embedding",
        k = ((graft.operators.KMeans.maxCentroidCells / 8) + 1).toInt, iters = 1)
    }
    assert(err.getMessage.contains("centroid cells"))
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
