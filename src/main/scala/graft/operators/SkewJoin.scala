package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the classic remedy when one build-key
  * value dominates and a single reducer drowns (AQE's skew-join split handles
  * sort-merge skew automatically; salting is the explicit, planner-independent
  * form that also works for aggregations feeding the join).
  *
  * The large (skewed) side gets a uniform salt in [0, saltFactor); the small
  * side is replicated once per salt value. Join keys become (key, salt), so a
  * hot key spreads over `saltFactor` reducers. Output rows are identical to
  * the unsalted join (salt columns are dropped) — asserted in SkewJoinSpec.
  */
object SkewJoin {

  def saltedEquiJoin(large: DataFrame, small: DataFrame,
                     largeKey: String, smallKey: String,
                     saltFactor: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        salted("__salt") === replicated("__salt")
          && salted(largeKey) === replicated(smallKey))
      .drop("__salt")
  }
}
