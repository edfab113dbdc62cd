package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSuite {

  import spark.implicits._

  test("compact merges a small-files directory to the byte-derived file count, rows intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = s"$dir/in"; val out = s"$dir/out"
    // simulate a micro-batch sink: 64 tiny files
    (0L until 10000L).map(i => (i, s"payload_$i")).toDF("id", "payload")
      .repartition(64).write.parquet(in)
    val total = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = total / 4 + 1 // expect ~4 output files
    val (before, after, bytes) = Bucketing.compact(spark, in, out, target)
    assert(before === 64)
    assert(bytes === total)
    assert(after === math.ceil(total.toDouble / target).toInt, s"after=$after")
    assert(after <= 4)
    val a = spark.read.parquet(in).orderBy("id").collect()
    val b = spark.read.parquet(out).orderBy("id").collect()
    assert(a.length === 10000 && (a sameElements b))
  }
}
