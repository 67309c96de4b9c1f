package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composite corpus-cleaning pipeline: the end-to-end operator a
  * training-data user actually runs — quality scoring → threshold filter →
  * exact dedup (canonical-row election) — composed from the individual
  * operators so every stage stays a declarative, shuffle-keyed plan.
  */
object Corpus {

  /** The q53 quality score: length-capped uniqueness ratio. */
  def qualityScore(textCol: Column): Column = {
    val words = split(textCol, " ")
    val nw = size(words)
    least(lit(1.0), nw / lit(100.0)) * (size(array_distinct(words)) / nw)
  }

  /** Kept documents: one canonical row (min id) per distinct text, quality
    * at or above `minQuality`. Output: (id, quality). */
  def clean(df: DataFrame, idCol: String, textCol: String,
            minQuality: Double): DataFrame = {
    val winners = df.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol))
      .select(col(idCol), qualityScore(col(textCol)).as("quality"))
    winners.filter(col("quality") >= minQuality)
  }
}
