package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** `iters` Lloyd rounds at `k` centroids seeded from the k lowest-id
    * vectors. Returns (idCol, cluster ∈ [0, k)). */
  def lloydFixed(df: DataFrame, idCol: String, embCol: String,
                 k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1 && iters <= 8, "k >= 1, iters in [1, 8]")
    val v = qRows(df, idCol, embCol).localCheckpoint(false)
    val init = df.select(col(idCol).as("vid")).orderBy("vid").limit(k)
      .withColumn("cid", row_number().over(Window.orderBy("vid")) - 1)
    var cent = v.join(init, Seq("vid")).select("cid", "dim", "x")
      .withColumnRenamed("x", "c")
    var asg: DataFrame = null
    for (_ <- 1 to iters) {
      asg = v.join(cent, Seq("dim"))
        .groupBy("vid", "cid")
        .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist"))
        .groupBy("vid")
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vid"), col("m.cid").as("cid"))
      cent = v.join(asg, Seq("vid")).groupBy("cid", "dim")
        .agg(expr("sum(x) div count(1)").as("c"))
    }
    asg.select(col("vid").as(idCol), col("cid").as("cluster"))
  }
}
