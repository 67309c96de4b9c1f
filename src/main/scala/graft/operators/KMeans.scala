package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed fixed-iteration Lloyd k-means over an embedding column, in
  * EXACT integer arithmetic — the fully distributed complement to the
  * bounded-sample codebook training `functions.Ivf` uses (there the
  * codebook is a driver-side artifact; here assignment AND update run as
  * shuffle joins over every row).
  *
  * Same determinism trick as `Graph.pageRankFixed`: embeddings are
  * quantized to micro-unit BIGINTs (floor(x·10⁶) — float→double widening
  * and floor are IEEE-identical in any engine), distances and centroid
  * updates are integer sums and truncating divisions, so the result is
  * bit-identical regardless of partitioning AND a SQL oracle replays every
  * round term for term. Ties in the argmin break to the lowest centroid id.
  *
  * Scale shape: each round is (a) one join of the (id, dim, x) rows against
  * the k·d centroid rows — Spark broadcasts the centroid side — plus a
  * two-level aggregation for the argmin, and (b) one shuffle on (cid, dim)
  * for the centroid update. No driver-side loop over data: `iters` is a
  * fixed small constant unrolled into the plan (k-means for corpus
  * bucketing stabilizes membership long before convergence in value).
  */
object KMeans {

  /** (vid, dim, x) quantized long rows of `df`'s embedding column. */
  private def qRows(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("vid"), posexplode(col(embCol)).as(Seq("dim", "e")))
      .select(col("vid"), col("dim"),
        floor(col("e").cast("double") * 1000000d).cast("long").as("x"))

  /** Ceiling on k·d centroid cells for the pinned broadcast below: 1M cells
    * ≈ 24 MB of (cid, dim, c) longs — comfortably under any sane
    * `spark.sql.autoBroadcastJoinThreshold`, and past it the n·d·k
    * assignment intermediate is the wrong algorithm anyway (use the
    * sampled-codebook `functions.Ivf` path instead). */
  val maxCentroidCells: Long = 1L << 20

  /** `iters` Lloyd rounds at `k` centroids seeded from the k lowest-id
    * vectors. Returns (idCol, cluster).
    *
    * Cluster ids start in [0, k), but a centroid that loses every member in
    * some round VANISHES for subsequent rounds (the update groupBy only
    * emits assigned cids), so the effective cluster count can shrink below
    * k — callers get a partition of the ids into AT MOST k clusters, not
    * exactly k. The SQL oracle replays the same drop, so parity holds; we
    * deliberately do not re-seed empty centroids (any deterministic re-seed
    * rule would complicate the term-for-term oracle for a case Lloyd's
    * algorithm itself leaves undefined).
    *
    * Cost shape, stated plainly: the assignment join explodes each of the
    * n·d quantized rows against all k centroids sharing its dim — an n·d·k
    * intermediate per round, inside one whole-stage-codegen broadcast-join
    * pipeline (no shuffle until the argmin aggregation on vid). The
    * centroid side is pinned with an explicit `broadcast()`: joining on
    * `dim` alone (a d-value key — 768 distinct keys at embedding scale)
    * must NEVER fall back to a shuffle join, where every partition's rows
    * for one dim would converge on d reducers — catastrophic skew the
    * optimizer could pick if k·d ever crossed the auto-broadcast
    * threshold. The `require` keeps k·d in firmly-broadcastable territory
    * (maxCentroidCells) instead of trusting a conf default. */
  def lloydFixed(df: DataFrame, idCol: String, embCol: String,
                 k: Int, iters: Int): DataFrame =
    lloydModel(df, idCol, embCol, k, iters)._1

  /** [[lloydFixed]] returning BOTH the final assignment and the centroid
    * table that assignment was scored against ((cid, dim, c) quantized
    * longs — i.e. the centroids after iters−1 update steps): the
    * trained "model" a scoring pass (batch or streaming, q246) applies
    * to new vectors. Same computation, same oracle parity. */
  def lloydModel(df: DataFrame, idCol: String, embCol: String,
                 k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && iters >= 1 && iters <= 8, "k >= 1, iters in [1, 8]")
    val v = qRows(df, idCol, embCol).localCheckpoint(false)
    // headOption: .head on an empty frame throws a bare "empty iterator" —
    // name the actual problem instead
    val d = df.select(size(col(embCol))).limit(1).collect().headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "lloydModel: empty input — no vectors to cluster"))
    require(k.toLong * d <= maxCentroidCells,
      s"k*d = ${k.toLong * d} centroid cells exceed $maxCentroidCells — " +
        "the broadcast assignment join is the wrong plan at that size; " +
        "use the IVF codebook path for large k*d")
    val init = df.select(col(idCol).as("vid")).orderBy("vid").limit(k)
      .withColumn("cid", row_number().over(Window.orderBy("vid")) - 1)
    var cent = v.join(init, Seq("vid")).select("cid", "dim", "x")
      .withColumnRenamed("x", "c")
    var asg: DataFrame = null
    var used: DataFrame = null
    for (_ <- 1 to iters) {
      used = cent
      asg = v.join(broadcast(cent), Seq("dim"))
        .groupBy("vid", "cid")
        .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist"))
        .groupBy("vid")
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vid"), col("m.cid").as("cid"))
      cent = v.join(asg, Seq("vid")).groupBy("cid", "dim")
        .agg(expr("sum(x) div count(1)").as("c"))
    }
    (asg.select(col("vid").as(idCol), col("cid").as("cluster")), used)
  }

  /** MAP-ONLY nearest-centroid scorer: an expression assigning an
    * embedding array column to the closest of the (driver-collected,
    * k·d-bounded — [[maxCentroidCells]]) centroids, exact-integer
    * distances, ties to the lowest cid — bit-identical to the join-based
    * argmin inside [[lloydModel]]. Because it is a pure projection it
    * needs NO streaming state: model scoring at ingest stays stateless
    * at any rate (q246). `centroids`: (cid, dim-ordered quantized
    * values). */
  def nearestCentroid(emb: Column, centroids: Seq[(Int, Seq[Long])]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val dims = centroids.map(_._2.size).distinct
    require(dims.size == 1, s"centroids disagree on dimension: $dims")
    val xq = transform(emb,
      e => floor(e.cast("double") * lit(1000000d)).cast("long"))
    val cands = centroids.sortBy(_._1).map { case (cid, cs) =>
      val dist = aggregate(
        zip_with(xq, typedLit(cs), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, t) => acc + t)
      struct(dist.as("dist"), lit(cid.toLong).as("cid"))
    }
    // a malformed vector (wrong length) would zip_with-pad to NULL dists,
    // and struct(null, cid) sorts BELOW real distances — classify it as
    // NULL, never silently into cluster 0
    when(size(emb) === dims.head,
      array_min(array(cands: _*)).getField("cid"))
  }
}
