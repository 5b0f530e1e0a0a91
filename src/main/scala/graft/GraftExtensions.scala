package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.engine.expressions.CosineSimilarity

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions so they are usable from SQL and `call_function`.
  *
  * Wire via `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftExtensions {
  /** Runtime registration for sessions built without the extension. */
  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.ColumnBridge.registerFunction(
      spark, "graft_cosine",
      exprs => CosineSimilarity(exprs.head, exprs(1)))
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "graft_cosine(a, b) takes two arrays")
        CosineSimilarity(exprs.head, exprs(1))
      }))
  }
}
