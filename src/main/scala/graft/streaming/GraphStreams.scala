package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental graph-motif detection on an EDGE STREAM — the streaming
  * face of the WCOJ subsystem (graft.plans.Leapfrog / q155): the batch
  * operator answers "how many triangles does the corpus have", this one
  * answers "which triangles closed as edges arrived", continuously.
  *
  * Shape: two cascaded stream-stream inner joins in append mode. Each
  * stream-stream join carries a watermark plus an event-time range
  * constraint, so every join's buffered state is bounded by the time
  * window — the binary-join plan that is WRONG for a 100 TB batch census
  * (intermediate above the AGM bound) is exactly right here, because the
  * state horizon, not the corpus, bounds the inputs. Beyond-parity vs the
  * reference (no streaming surface at all).
  *
  * Input contract: canonical undirected edges (src < dst, distinct within
  * the window) with an event-time column `ts`. A triangle a<b<c is
  * emitted once when edges (b,c) and (a,c) both arrive within
  * `joinWindow` of edge (a,b) — the range constraints are anchored on the
  * FIRST edge, so the second and third edges may be up to 2×joinWindow
  * apart from each other. Late edges beyond `watermarkDelay` are dropped
  * by the watermark like every other streaming op here.
  */
object GraphStreams {

  def triangles(edges: DataFrame, watermarkDelay: String = "2 hours",
                joinWindow: String = "1 hour"): DataFrame = {
    val e1 = edges.withWatermark("ts", watermarkDelay).as("e1")
    val e2 = edges.withWatermark("ts", watermarkDelay).as("e2")
    val e3 = edges.withWatermark("ts", watermarkDelay).as("e3")
    e1.join(e2, expr(
        s"""e2.src = e1.dst
            AND e2.ts BETWEEN e1.ts - INTERVAL $joinWindow
                          AND e1.ts + INTERVAL $joinWindow"""))
      .join(e3, expr(
        s"""e3.src = e1.src AND e3.dst = e2.dst
            AND e3.ts BETWEEN e1.ts - INTERVAL $joinWindow
                          AND e1.ts + INTERVAL $joinWindow"""))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"),
        col("e2.dst").as("c"))
  }
}
