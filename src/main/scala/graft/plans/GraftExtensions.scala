package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension wiring: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(spark => new UctJoinReorderRule(spark))
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.size != 2)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`graft_dot`", "expectedNum" -> "2",
              "actualNum" -> children.size.toString, "docroot" -> "https://spark.apache.org/docs/latest"))
        graft.functions.DotProduct(children(0), children(1))
      }))
  }
}
