package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension wiring: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(spark => new UctJoinReorderRule(spark))
  }
}
