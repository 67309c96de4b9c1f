package graft

import graft.operators.Rank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank.atScale — the two-phase range-partitioned rank — must equal
  * row_number() over the same total order exactly, at any partition
  * count, and must never plan a single-reducer sort over the data. */
class RankSpec extends SparkSpec {
  private val session = SparkSpec.session
  import session.implicits._

  test("atScale equals row_number over the same total order") {
    // duplicate values force the tie-break path; a skewed head (40% of
    // rows share one value) forces several identical keys per partition
    val df = (1L to 500L).map(i => (if (i % 5 < 2) 7L else i % 97, i))
      .toDF("v", "id")
    val got = Rank.atScale(df, Seq(col("v"), col("id")), out = "r",
        partitions = 8)
      .select("id", "r").as[(Long, Long)].collect().toMap
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("atScale: descending order, totalOut, and empty input") {
    val df = (1L to 100L).map(i => (i % 10, i)).toDF("n", "k")
    val out = Rank.atScale(df, Seq(col("n").desc, col("k")), out = "r",
      totalOut = "tot", partitions = 4)
    val rows = out.orderBy("r").select("n", "k", "r", "tot")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._3).toSeq === (1L to 100L))
    assert(rows.forall(_._4 == 100L))
    // rank 1 = highest n, lowest k among them
    assert(rows.head._1 == 9L && rows.head._2 == 9L)
    val empty = Rank.atScale(df.where(lit(false)), Seq(col("n")), out = "r")
    assert(empty.count() == 0)
  }

  test("atScalePerGroup equals the per-group row_number, null group included") {
    // two hot groups + a NULL group + a singleton, dup values for ties
    val df = (1L to 300L).map(i =>
        (if (i % 7 == 0) None else Some((i % 3).toString), i % 11, i))
      .toDF("g", "v", "id")
    val got = Rank.atScalePerGroup(df, Seq("g"), Seq(col("v"), col("id")),
        out = "r", totalOut = "n", partitions = 8)
      .select("id", "r", "n").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val want = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .select("id", "r", "n").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === want)
  }

  test("atScale plans no single-partition exchange over the data side") {
    // the offsets side may cumulate over the BOUNDED ≤overFactor·partitions
    // count aggregate; the ranked data itself must never pass through an
    // Exchange SinglePartition + global sort (the weak-gate shape this
    // operator exists to retire). Since the de-checkpoint (VERDICT r14 #2)
    // the FULL lineage is visible in one plan: assert the data side is a
    // hash exchange on the sampled-boundary bucket id and that no
    // checkpointed RDD scan remains.
    val df = (1L to 1000L).map(i => (i % 37, i)).toDF("v", "id")
    val ranked = Rank.atScale(df, Seq(col("v"), col("id")), out = "r",
      partitions = 8)
    val plan = ranked.queryExecution.executedPlan.toString()
    val single = "SinglePartition".r.findAllIn(plan).size
    // exactly the one bounded offsets cumulation, never a second (data) one
    assert(single <= 1, s"unexpected SinglePartition exchanges:\n$plan")
    // and the rank window itself is keyed by the bucket id
    assert(plan.contains("__pid"), plan)
    // lineage preserved: no localCheckpoint scan (the old implementation's
    // block-storage materialization) anywhere in the plan
    assert(!plan.contains("ExistingRDD"), plan)
  }

  test("atScale is deterministic across repeated runs (sampled boundaries)") {
    // the boundary sample is seeded per partition index, so two full
    // materializations — and the pruned counts subtree vs the rank
    // subtree within ONE run — assign identical buckets; ranks must be
    // bit-identical run over run (the property localCheckpoint used to
    // pin by materialization, now held by construction)
    val df = (1L to 2000L).map(i => ((i * 2654435761L) % 1009, i))
      .toDF("v", "id")
    def run() = Rank.atScale(df, Seq(col("v"), col("id")), out = "r",
        partitions = 8)
      .select("id", "r").as[(Long, Long)].collect().toMap
    val a = run()
    val b = run()
    assert(a === b)
    // and equals the single-reducer row_number ground truth
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(a === want)
  }
}
