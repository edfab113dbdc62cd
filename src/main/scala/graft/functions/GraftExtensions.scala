package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

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
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_signature"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
        (exprs: Seq[Expression]) =>
          exprs match {
            case Seq(tokens, Literal(k: Int, IntegerType)) => MinHashSignature(tokens, k)
            case Seq(tokens) => MinHashSignature(tokens, 64)
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
            case Seq(text, Literal(n: Int, IntegerType)) => WordShingles(text, n)
            case Seq(text) => WordShingles(text, 3)
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
            // explicit casts: without ExpectsInputTypes there is no
            // implicit coercion, and SQL float literals arrive as decimals
            case Seq(a, b) =>
              DotProduct(Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))
            case _ => throw new IllegalArgumentException("dot_product(a array<double>, b array<double>)")
          }
      ))
  }
}
