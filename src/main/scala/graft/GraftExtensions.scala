package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProduct, EditWithin1, MinHashSig, NormalizeText, SimHashAgg, TopKRows, WordSetCount, WordShingles}

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
    // Whole-operator extension: plans graft.plans.AsOfJoinNode into its
    // native sorted-merge SparkPlan (see plans/AsOfJoinNative.scala).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
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
      FunctionIdentifier("graft_edit_within1"),
      new ExpressionInfo(classOf[EditWithin1].getName, "graft_edit_within1"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "graft_edit_within1(a, b) takes 2 arguments")
        EditWithin1(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize_text"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1, "graft_normalize_text(text) takes 1 argument")
        NormalizeText(args(0))
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
    ext.injectFunction((
      FunctionIdentifier("graft_heavyhitters"),
      new ExpressionInfo(classOf[graft.functions.HeavyHitters].getName,
        "graft_heavyhitters"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "graft_heavyhitters(item, k) takes 2 arguments")
        graft.functions.HeavyHitters(args(0), args(1))
      }))
    // Catalyst's own runtime-filter pair, exposed for explicit use: build a
    // Bloom bitmap over dim keys in a scalar subquery, probe fact rows at
    // scan speed. Keys hash with xxhash64(seed 42) on both sides.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 3,
          "graft_bloom_agg(key, expectedItems, numBits) takes 3 arguments")
        // SQL integer literals arrive as INT; the aggregate wants BIGINT.
        def asLong(e: org.apache.spark.sql.catalyst.expressions.Expression) =
          org.apache.spark.sql.catalyst.expressions.Cast(
            e, org.apache.spark.sql.types.LongType)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args(0))),
          asLong(args(1)), asLong(args(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "graft_might_contain(bloom, key) takes 2 arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0),
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args(1))))
      }))
  }
}
