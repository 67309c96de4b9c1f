package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-similarity operators over ANY DataFrame with an id column and a
  * float/double array column — the library surface behind the
  * `embeddings`-table queries in graft.queries.VectorOps.
  *
  * Scores use graft.functions.DotProduct (whole-stage codegen, left-to-right
  * double fold); norms are computed once per vector, never per pair.
  */
object Similarity {

  /** codegen'd dot product */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(graft.functions.DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine near-dup pairs ≥ threshold. Default entry point: small inputs
    * (≤ exactMaxRows) run the exact O(n²) scan — cheap and lossless; anything
    * larger routes through LSH-bucketed candidate generation + exact re-rank
    * (`nearDupPairsLsh`), the plan that survives a 100× scale-up. The row
    * guard exists because the exact scan is the operator a user reaches for
    * first — it must not silently become a 10¹²-pair cross join.
    */
  def nearDupPairs(df: DataFrame, idCol: String, embCol: String,
                   threshold: Double, exactMaxRows: Long = 65536): DataFrame = {
    // checkpoint the input so the probe and the chosen branch share one
    // upstream execution (df may be an expensive derived pipeline), then
    // probe at most exactMaxRows+1 rows — never a full count
    val in = df.localCheckpoint(false)
    if (in.limit(math.min(exactMaxRows + 1, Int.MaxValue.toLong).toInt).count()
        <= exactMaxRows)
      nearDupPairsExact(in, idCol, embCol, threshold)
    else
      // above the guard the result is the LSH candidates re-ranked exactly:
      // precision 1.0 but recall < 1 — callers needing the lossless scan at
      // any size must call nearDupPairsExact explicitly
      nearDupPairsLsh(in, idCol, embCol, threshold)
  }

  /** Exact cosine near-dup pairs ≥ threshold (O(n²) pair scan with per-pair
    * work reduced to one codegen dot — the verification baseline). The
    * streamed side is spread over the shuffle parallelism first: the
    * quadratic dot-product work otherwise inherits the INPUT's partition
    * count, and a small/single-row-group source (exactly the inputs the
    * row guard admits here) would run the whole n² scan on one core —
    * the broadcast side stays tiny, the output pair set is identical. */
  def nearDupPairsExact(df: DataFrame, idCol: String, embCol: String,
                        threshold: Double): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val a = df.select(col(idCol).as("a_id"), col(embCol).as("ea"),
      norm(col(embCol)).as("na")).repartition(p)
    val b = df.select(col(idCol).as("b_id"), col(embCol).as("eb"),
      norm(col(embCol)).as("nb"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }

  /** LSH-bucketed near-dup pairs: candidates are vector pairs sharing a
    * sign-of-projection bucket in ANY of `nTables` tables (a map-side bucket
    * emit + one shuffle keyed on (table, bucket) — never an all-pairs
    * product), then exact cosine re-rank so every emitted pair truly clears
    * `threshold` (precision 1.0; recall is the per-table collision odds
    * compounded over tables — 16×4 targets ≳0.9 recall at cos ≥ 0.4,
    * asserted in VectorOpsSpec).
    */
  def nearDupPairsLsh(df: DataFrame, idCol: String, embCol: String,
                      threshold: Double, nTables: Int = 16,
                      planesPerTable: Int = 4): DataFrame = {
    // spread before the checkpoint: the per-vector bucket computation
    // (nTables × planes projections) and every re-rank dot inherit the
    // checkpoint's partitioning (graft.Db.spread — no-op at scale)
    val vecs = graft.Db.spread(
        df.select(col(idCol), col(embCol), norm(col(embCol)).as("nrm")))
      .localCheckpoint(false)
    val buckets = lshBuckets(vecs, embCol, nTables, planesPerTable)
      .select(col(idCol), col("table"), col("bucket"))
    val cand = buckets.select(col(idCol).as("a_id"), col("table"), col("bucket"))
      .join(buckets.select(col(idCol).as("b_id"), col("table"), col("bucket")),
        Seq("table", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cand
      .join(vecs.select(col(idCol).as("a_id"), col(embCol).as("ea"), col("nrm").as("na")),
        Seq("a_id"))
      .join(vecs.select(col(idCol).as("b_id"), col(embCol).as("eb"), col("nrm").as("nb")),
        Seq("b_id"))
      .withColumn("cos", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }

  /** Exact top-k by cosine against one query vector (given as a 1-row frame
    * with column qv). */
  def topK(df: DataFrame, idCol: String, embCol: String,
           query: DataFrame, k: Int): DataFrame =
    df.crossJoin(broadcast(query.select(col("qv"), norm(col("qv")).as("qn"))))
      .select(col(idCol),
        (dot(col(embCol), col("qv")) / (norm(col(embCol)) * col("qn"))).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Train an IVF codebook (Lloyd k-means) on a bounded deterministic
    * sample — thousands of rows regardless of table size; assignment then
    * scales out. */
  def ivfCodebook(df: DataFrame, idCol: String, embCol: String,
                  k: Int = 16, sampleSize: Int = 2048): Array[Array[Double]] = {
    val sample = df.orderBy(col(idCol)).limit(sampleSize)
      .select(col(embCol)).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case null => 0.0
      }.toArray)
    graft.functions.Ivf.kmeans(sample, k)
  }

  /** Assign every vector to its nearest-centroid cell (the IVF partition /
    * bucketing key at cluster scale). */
  def ivfAssign(df: DataFrame, embCol: String,
                centroids: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.GraftShims
    df.withColumn("ivf_cell", element_at(GraftShims.column(
      graft.functions.NearestCentroids(
        GraftShims.expression(col(embCol)), centroids, 1)), 1))
  }

  /** Ad-hoc IVF top-k WITHOUT a materialized index: assigns cells at query
    * time, so it still scans (and runs the codebook k-NN over) the whole
    * table — one full pass saved only on the re-rank math. Use `ivfBuild` +
    * `ivfProbeTopK` for the real inverted-file shape; this stays as the
    * no-index fallback for one-shot queries where building costs more than
    * one scan. */
  def ivfTopK(df: DataFrame, idCol: String, embCol: String, query: DataFrame,
              k: Int, centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val cells = queryCells(query, centroids, nProbe)
    ivfAssign(df, embCol, centroids)
      .filter(col("ivf_cell").isin(cells: _*))
      .crossJoin(broadcast(query.select(col("qv"), norm(col("qv")).as("qn"))))
      .select(col(idCol),
        (dot(col(embCol), col("qv")) / (norm(col(embCol)) * col("qn"))).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** The query vector's nProbe nearest cells (a driver-side handful of ints —
    * the only part of a probe that touches the codebook). */
  private def queryCells(query: DataFrame, centroids: Array[Array[Double]],
                         nProbe: Int): Seq[Int] = {
    import org.apache.spark.sql.GraftShims
    query.select(GraftShims.column(
        graft.functions.NearestCentroids(
          GraftShims.expression(col("qv")), centroids, nProbe)).as("cells"))
      .collect()(0).getSeq[Int](0)
  }

  /** Build a materialized IVF index: train the codebook, assign every row its
    * cell ONCE, and lay the table out hive-partitioned by `ivf_cell` (the
    * Spark analog of an inverted file: one directory per posting list). The
    * codebook is persisted beside the data, so later probes — any session,
    * any process — reconstruct the cell mapping without rescanning anything.
    * Returns the codebook. */
  def ivfBuild(df: DataFrame, idCol: String, embCol: String, path: String,
               k: Int = 16, sampleSize: Int = 2048): Array[Array[Double]] = {
    val codebook = ivfCodebook(df, idCol, embCol, k, sampleSize)
    ivfAssign(df, embCol, codebook)
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(path)
    val json = codebook.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_codebook.json"), json)
    codebook
  }

  def ivfLoadCodebook(path: String): Array[Array[Double]] = {
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "_codebook.json")).trim
    // rows are [d1,d2,...] groups; strip outer brackets, split on "],["
    json.stripPrefix("[").stripSuffix("]").stripPrefix("[").stripSuffix("]")
      .split("\\],\\[")
      .map(_.split(",").map(_.toDouble))
  }

  /** IVF ANN probe against a `ivfBuild` index: reads ONLY the nProbe probed
    * cells' partitions (a PartitionFilters-pruned directory scan — no cell
    * assignment, no full pass), then exact cosine re-rank inside them. The
    * scan cost is nProbe/k of the table at any scale. */
  def ivfProbeTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                   idCol: String, embCol: String, query: DataFrame, k: Int,
                   nProbe: Int): DataFrame = {
    val centroids = ivfLoadCodebook(path)
    val cells = queryCells(query, centroids, nProbe)
    spark.read.parquet(path)
      .filter(col("ivf_cell").isin(cells: _*))
      .crossJoin(broadcast(query.select(col("qv"), norm(col("qv")).as("qn"))))
      .select(col(idCol),
        (dot(col(embCol), col("qv")) / (norm(col(embCol)) * col("qn"))).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Train PQ sub-codebooks on the same bounded deterministic sample shape
    * as ivfCodebook: thousands of rows regardless of table size. */
  def pqCodebooks(df: DataFrame, idCol: String, embCol: String,
                  m: Int = 16, k: Int = 256,
                  sampleSize: Int = 2048): Array[Array[Array[Double]]] = {
    val sample = df.orderBy(col(idCol)).limit(sampleSize)
      .select(col(embCol)).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case null => 0.0
      }.toArray)
    graft.functions.Pq.train(sample, m, k)
  }

  /** Encode every vector to its m PQ codes — the compact representation a
    * billion-vector store scans instead of raw floats (m ints vs d floats;
    * 1 byte per code at k ≤ 256 in a binary layout). One map-side pass. */
  def pqEncode(df: DataFrame, idCol: String, embCol: String,
               books: Array[Array[Array[Double]]]): DataFrame = {
    import org.apache.spark.sql.GraftShims
    df.select(col(idCol), GraftShims.column(graft.functions.PqEncode(
      GraftShims.expression(col(embCol)), books)).as("pq_codes"))
  }

  /** ADC top-k over PQ codes: the query's m × k distance table is computed
    * once on the driver and shipped via the expression; each candidate then
    * costs m lookups over its codes — the scan never touches a float
    * vector. Ascending approximate L2, id tiebreak. */
  def pqTopK(codes: DataFrame, idCol: String, query: Array[Double],
             books: Array[Array[Array[Double]]], k: Int): DataFrame = {
    import org.apache.spark.sql.GraftShims
    val table = graft.functions.Pq.adcTable(query, books)
    codes.select(col(idCol), GraftShims.column(graft.functions.PqAdcScore(
        GraftShims.expression(col("pq_codes")), table)).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** Sign-of-projection LSH, L tables × k hyperplanes: per table, bucket =
    * k sign bits of v · h_(t,p) for deterministic seeded hyperplanes. Emits
    * one (table, bucket) row per vector per table — a map-side pass + a
    * shuffle keyed on (table, bucket), the cluster-scale ANN plan: k bounds
    * bucket occupancy, L recovers recall. All L×k projections run in ONE
    * codegen expression (graft.functions.HyperplaneBuckets) whose planes
    * live in a process cache — embedding them as plan literals made plan
    * compile cost scale with L×k and dominated the runtime.
    */
  def lshBuckets(df: DataFrame, embCol: String, nTables: Int,
                 planesPerTable: Int, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.GraftShims
    val buckets = GraftShims.column(graft.functions.HyperplaneBuckets(
      GraftShims.expression(col(embCol)), nTables, planesPerTable, dim, 42L))
    df.select(col("*"), posexplode(buckets).as(Seq("table", "bucket")))
  }
}
