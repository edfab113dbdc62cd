package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal, Round}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StringType}

/** SparkSessionExtensions hook exposing the native expressions to SQL:
  *
  * {{{
  *   SELECT minhash_signature(tokens, 64), dot_product(a, b) FROM ...
  * }}}
  *
  * Wired via `SparkSession.builder.withExtensions(new GraftExtensions)`
  * (done in [[graft.Sessions]]) or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // transparent acceleration: the portable regex token-count form
    // optimizes into the native single-scan kernel (see NativeRewriteRule)
    ext.injectOptimizerRule(_ => graft.plans.NativeRewriteRule)
    // automatic materialized-view rewrite: aggregates over a registered
    // base fact re-target onto its summary table (see AggMvRewriteRule)
    ext.injectOptimizerRule(session => new graft.plans.AggMvRewriteRule(session))
    // whole-operator extensions: the native AS-OF and interval joins
    // (logical node → strategy → sort-merge physical operator)
    // persisted snapshot-catalog views: Spark 4.1.2 ships the DSv2
    // ViewCatalog SPI with no analyzer/DDL consumption — the parser
    // hook executes the view DDL, the resolution rule substitutes
    // stored views into queries (see graft.plans.GraftViews)
    ext.injectParser((session, delegate) => new graft.plans.GraftViewParser(session, delegate))
    ext.injectResolutionRule(session => new graft.plans.GraftViewSubstitution(session))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_signature"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
        (exprs: Seq[Expression]) =>
          // explicit casts (here and below): the expressions skip
          // ExpectsInputTypes (private[sql] AbstractDataType), so without
          // a cast a wrong-typed argument dies at execution time with a
          // ClassCastException instead of a plan-time analysis error
          exprs match {
            case Seq(tokens, Literal(k: Int, IntegerType)) =>
              MinHashSignature(Cast(tokens, ArrayType(StringType)), k)
            case Seq(tokens) => MinHashSignature(Cast(tokens, ArrayType(StringType)), 64)
            case _ => throw new IllegalArgumentException(
              "minhash_signature(tokens array<string>[, k int literal])")
          }
      ))
    ext.injectFunction(
      (
        FunctionIdentifier("word_shingles"),
        new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
        (exprs: Seq[Expression]) =>
          exprs match {
            case Seq(text, Literal(n: Int, IntegerType)) => WordShingles(Cast(text, StringType), n)
            case Seq(text) => WordShingles(Cast(text, StringType), 3)
            case _ => throw new IllegalArgumentException(
              "word_shingles(text string[, n int literal])")
          }
      ))
    ext.injectFunction(
      (
        FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (exprs: Seq[Expression]) =>
          exprs match {
            case Seq(a, b) =>
              DotProduct(Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))
            case _ => throw new IllegalArgumentException("dot_product(a array<double>, b array<double>)")
          }
      ))
    ext.injectFunction(
      (
        FunctionIdentifier("quality_score"),
        new ExpressionInfo(classOf[QualityScoreRaw].getName, "quality_score"),
        (exprs: Seq[Expression]) =>
          exprs match {
            // rounded like the Column API: Spark's own Round for
            // cross-engine round-half parity
            case Seq(text) => Round(QualityScoreRaw(Cast(text, StringType)), Literal(4))
            case _ => throw new IllegalArgumentException("quality_score(text string)")
          }
      ))
    ext.injectFunction(
      (
        FunctionIdentifier("token_count"),
        new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
        (exprs: Seq[Expression]) =>
          exprs match {
            case Seq(text) => TokenCount(Cast(text, StringType))
            case _ => throw new IllegalArgumentException("token_count(text string)")
          }
      ))
    ext.injectFunction(
      (
        FunctionIdentifier("l2_normalize"),
        new ExpressionInfo(classOf[L2Normalize].getName, "l2_normalize"),
        (exprs: Seq[Expression]) =>
          exprs match {
            case Seq(v) => L2Normalize(Cast(v, ArrayType(DoubleType)))
            case _ => throw new IllegalArgumentException("l2_normalize(v array<double>)")
          }
      ))
  }
}
