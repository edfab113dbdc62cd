package graft.functions

import graft.SparkSuite
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class ArrayExpressionsSpec extends SparkSuite {

  import spark.implicits._

  test("DotProduct is bit-identical to the higher-order-function fold") {
    val df = Seq((Array(1.5, -2.0, 3.25), Array(0.5, 4.0, -1.25))).toDF("a", "b")
    val (fast, ref) = df.select(
      native.dotProduct(col("a"), col("b")),
      Similarity.dot(col("a"), col("b"))).as[(Double, Double)].head()
    assert(fast === ref)
    assert(fast === 1.5 * 0.5 + -2.0 * 4.0 + 3.25 * -1.25)
  }

  test("MinHashSignature: identical inputs → identical signatures; length k; deterministic") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("c d e", "a b c", "b c d")), // same set, different order
      (3L, Seq("x y z"))
    ).toDF("id", "sh")
    val sigs = df.select(col("id"), native.minhashSignature(col("sh"), 32).alias("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length === 32)
    assert(sigs(1L) === sigs(2L)) // set semantics under min
    assert(sigs(1L) !== sigs(3L))
  }

  test("interpreted eval matches codegen (empty + null-element arrays)") {
    // force both paths through a small df: collect() exercises codegen;
    // the Literal fold below exercises interpreted eval
    val viaDf = Seq(Seq("q", "w")).toDF("sh")
      .select(native.minhashSignature(col("sh"), 8)).head().getSeq[Long](0)
    val interp = MinHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("q", "w"), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      8).eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    assert(viaDf === interp)
  }

  test("all native kernels compile under whole-stage codegen — no silent interpreted fallback") {
    // with codegen.fallback=false a janino compile error in any doGenCode
    // THROWS instead of silently degrading the stage to Volcano mode —
    // this pins that the static-kernel calls (ExprKernels.*) really run
    // inside generated code
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = Seq(("The quick brown fox, it is 42!", Array(0.6, 0.8)))
        .toDF("text", "vec")
        .select(
          native.tokenCount(col("text")).alias("tc"),
          native.qualityScore(col("text")).alias("q"),
          native.wordShingles(col("text"), 2).alias("sh"),
          native.l2normalize(col("vec")).alias("l2"),
          native.dotProduct(col("vec"), col("vec")).alias("dp"),
          native.minhashSignature(native.wordShingles(col("text"), 2), 4).alias("mh"))
        .collect()
      assert(rows.head.getAs[Int]("tc") === 9) // the|quick|brown|fox|,|it|is|42|!
      assert(rows.head.getAs[Double]("dp") === 1.0)
      assert(rows.head.getSeq[Long](5).length === 4)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("WordShingles matches the higher-order reference on edge cases") {
    val texts = Seq(
      "The quick brown FOX jumps over the lazy dog",
      "one two",
      "single",
      "  leading   and trailing   ",
      "a b c d"
    ).toDF("text")
    val both = texts.select(
      native.wordShingles(col("text"), 3).alias("fast"),
      graft.ops.Dedup.shingles(col("text"), 3).alias("ref"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"mismatch for row $r")
    }
  }

  test("SQL registration via GraftExtensions") {
    val sig = spark.sql("SELECT minhash_signature(array('a','b'), 16) AS s, dot_product(array(1.0,2.0), array(3.0,4.0)) AS d")
      .head()
    assert(sig.getSeq[Long](0).length === 16)
    assert(sig.getDouble(1) === 11.0)
  }

  test("L2Normalize matches the HOF form bit-for-bit and nulls out zero vectors") {
    val df = Seq(
      (1L, Seq(3.0, 4.0)),
      (2L, Seq(0.1, -0.2, 0.7)),
      (3L, Seq(0.0, 0.0, 0.0)) // zero vector → NULL, not NaN
    ).toDF("id", "v")
    val got = df.select(col("id"), native.l2normalize(col("v")).alias("n")).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(got(1L).get === Seq(0.6, 0.8))
    // bit-identical to transform(v, x -> x / sqrt(dot(v, v)))
    val ref = df.filter(col("id") === 2L)
      .select(transform(col("v"), x => x / sqrt(native.dotProduct(col("v"), col("v")))))
      .head().getSeq[Double](0)
    assert(got(2L).get === ref)
    assert(got(3L).isEmpty)
    // SQL surface + interpreted path agree with codegen
    val viaSql = spark.sql("SELECT l2_normalize(array(3.0, 4.0)) AS n").head().getSeq[Double](0)
    assert(viaSql === Seq(0.6, 0.8))
    assert(spark.sql("SELECT l2_normalize(array(0.0)) AS n").head().isNullAt(0))
  }

  test("quality_score SQL function matches the Column API") {
    val txt = "the quick brown fox jumps over the lazy dog and runs to the river"
    val viaSql = spark.sql(s"SELECT quality_score('$txt') AS q").head().getDouble(0)
    val viaCol = Seq(txt).toDF("text")
      .select(native.qualityScore(col("text"))).head().getDouble(0)
    assert(viaSql === viaCol)
  }

  test("token_count SQL function matches the Column API") {
    val txt = "ab c1 d! mixed 123abc"
    val viaSql = spark.sql(s"SELECT token_count('$txt') AS n").head().getInt(0)
    val viaCol = Seq(txt).toDF("text")
      .select(native.tokenCount(col("text"))).head().getInt(0)
    assert(viaSql === viaCol && viaSql === 8)
  }
}
