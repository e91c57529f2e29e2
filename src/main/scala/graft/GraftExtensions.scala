package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProduct, MinHashSig, SimHashAgg, TopKRows, WordSetCount, WordShingles}

/** Registers the engine's native Catalyst expressions as SQL functions:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * spark.sql("SELECT graft_dot(a.vec, b.vec) FROM ...")
  * }}}
  *
  * The Scala Column API ([[graft.functions.GraftFunctions]]) does not
  * require this — it constructs the expressions directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "graft_dot(a, b) takes 2 arguments")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKRows].getName, "graft_topk"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 3, "graft_topk(key, value, k) takes 3 arguments")
        TopKRows(args(0), args(1), args(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "graft_shingles(text, n) takes 2 arguments")
        WordShingles(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_wordset_count"),
      new ExpressionInfo(classOf[WordSetCount].getName, "graft_wordset_count"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "graft_wordset_count(text, words) takes 2 arguments")
        WordSetCount(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1, "graft_simhash(hash) takes 1 argument")
        SimHashAgg(args(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "graft_minhash(hash, k) takes 2 arguments")
        MinHashSig(args(0), args(1))
      }))
  }
}
