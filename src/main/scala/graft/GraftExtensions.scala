package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.engine.expressions.{ArrayDot, ArrayNormSq, CosineSimilarity, HammingDistance, MinHashSignature, SrpSignature}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions so they are usable from SQL and `call_function`.
  *
  * Wire via `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftExtensions {

  private def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $other")
    }
  }

  private[graft] def buildSrp(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): SrpSignature = {
    require(exprs.length == 3, "graft_srp_signature(vec, bits, dim)")
    SrpSignature(exprs.head, litInt(exprs(1), "bits"), litInt(exprs(2), "dim"))
  }

  private[graft] def buildMinhash(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): MinHashSignature = {
    require(exprs.length == 2, "graft_minhash(shingle_hashes, k)")
    MinHashSignature(exprs.head, litInt(exprs(1), "k"))
  }

  private[graft] def buildCosine(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): CosineSimilarity = {
    require(exprs.length == 2, "graft_cosine(a, b) takes two double arrays")
    CosineSimilarity(exprs.head, exprs(1))
  }

  private[graft] def buildHamming(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): HammingDistance = {
    require(exprs.length == 2, "graft_hamming(a, b) takes two long arrays")
    HammingDistance(exprs.head, exprs(1))
  }

  private[graft] def buildDot(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): ArrayDot = {
    require(exprs.length == 2, "graft_dot(a, b) takes two double arrays")
    ArrayDot(exprs.head, exprs(1))
  }

  private[graft] def buildNormSq(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): ArrayNormSq = {
    require(exprs.length == 1, "graft_norm_sq(a) takes one double array")
    ArrayNormSq(exprs.head)
  }

  /** Runtime registration for sessions built without the extension. */
  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit = {
    val bridge = org.apache.spark.sql.graftbridge.ColumnBridge
    bridge.registerFunction(spark, "graft_cosine", buildCosine)
    bridge.registerFunction(spark, "graft_hamming", buildHamming)
    bridge.registerFunction(spark, "graft_srp_signature", buildSrp)
    bridge.registerFunction(spark, "graft_minhash", buildMinhash)
    bridge.registerFunction(spark, "graft_dot", buildDot)
    bridge.registerFunction(spark, "graft_norm_sq", buildNormSq)
    if (!spark.experimental.extraOptimizations
        .contains(graft.engine.rules.RewriteHofCosine))
      spark.experimental.extraOptimizations ++=
        Seq(graft.engine.rules.RewriteHofCosine)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // one builder per function, shared with registerOn — the two
    // registration paths must not diverge in validation or messages
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      GraftExtensions.buildCosine _))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
      GraftExtensions.buildHamming _))
    ext.injectFunction((
      FunctionIdentifier("graft_srp_signature"),
      new ExpressionInfo(classOf[SrpSignature].getName, "graft_srp_signature"),
      GraftExtensions.buildSrp _))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      GraftExtensions.buildMinhash _))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      GraftExtensions.buildDot _))
    ext.injectFunction((
      FunctionIdentifier("graft_norm_sq"),
      new ExpressionInfo(classOf[ArrayNormSq].getName, "graft_norm_sq"),
      GraftExtensions.buildNormSq _))
    // declarative HOF cosine → native codegen'd expression (see the rule's
    // Scaladoc for the exact pattern and the semantics-preservation guard)
    ext.injectOptimizerRule(_ => graft.engine.rules.RewriteHofCosine)
  }
}
