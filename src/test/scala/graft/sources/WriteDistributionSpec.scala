package graft.sources

import graft.SparkSuite
import graft.store.{PartitionSpec, SnapshotStore}
import org.apache.spark.sql.functions._

/** Write distribution modes (`spark.graft.write.distribution` —
  * [[BucketDistribution]]): the opt-in shuffle request that fixes the
  * small-file explosion on partitioned INSERTs whose input
  * partitioning is adversarial (every task holds rows of every
  * partition). `hash` clusters the shuffle by the partition source
  * columns with a size advisory (AQE rebalance), `range` orders
  * globally; both land ≈ one file per partition value on small data
  * where the default emits #tasks × #partitions. Answers never
  * change — the mode only moves rows between write tasks. */
class WriteDistributionSpec extends SparkSuite {

  import spark.implicits._

  private def withCatalog(body: (String, String) => Unit): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("wdist-wh").toString
    val cat = "wdist" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(cat, wh)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  private def withMode(mode: String)(body: => Unit): Unit = {
    spark.conf.set("spark.graft.write.distribution", mode)
    try body
    finally spark.conf.unset("spark.graft.write.distribution")
  }

  /** 8 months × 400 rows, repartitioned round-robin so EVERY input
    * task holds rows of EVERY month — the restatement/backfill shape
    * the distribution modes exist for. */
  private def adversarial() = {
    val df = spark.range(3200)
      .select(
        col("id"),
        expr("timestamp'2024-01-15 00:00:00' + make_interval(0, cast(id % 8 as int))")
          .alias("ts"),
        (col("id") * 3L).alias("v"))
    df.repartition(16)
  }

  /** Files the version ADDED vs its predecessor, grouped by partition
    * dir. */
  private def newFilesByPartition(t: String, v: Long): Map[String, Int] = {
    val prev = SnapshotStore.dataFiles(
      spark, SnapshotStore.manifest(spark, t, v - 1)).toSet
    SnapshotStore.dataFiles(spark, SnapshotStore.manifest(spark, t, v))
      .filterNot(prev)
      .groupBy(f => f.split('/').find(_.startsWith("__g")).getOrElse("?"))
      .map { case (k, fs) => k -> fs.size }
  }

  test("hash mode: adversarial INSERT INTO lands one file per partition, same answers") {
    withCatalog { (cat, wh) =>
      val t = s"$wh/facts/t"
      SnapshotStore.partitionedCommit(
        adversarial().limit(0), t, Seq(PartitionSpec.PartField("months", "ts")))
      spark.sql(s"DROP TABLE IF EXISTS graft_wdist_tmp")
      adversarial().createOrReplaceTempView("graft_wdist_src")

      withMode("hash") {
        spark.sql(s"INSERT INTO $cat.facts.t SELECT * FROM graft_wdist_src")
      }
      val perPart = newFilesByPartition(t, 1L)
      assert(perPart.size === 8, s"8 month partitions, got $perPart")
      assert(perPart.values.forall(_ === 1),
        s"small data under an advisory must coalesce to ONE file per partition: $perPart")

      val got = spark.read.format("graft-snapshot").option("path", t).load()
        .agg(count(lit(1)), sum(col("v")), countDistinct(col("ts"))).collect()(0)
      val want = adversarial()
        .agg(count(lit(1)), sum(col("v")), countDistinct(col("ts"))).collect()(0)
      assert(got === want, "the distribution mode must never change answers")
    }
  }

  test("hash mode clusters by the DERIVED month, not the raw timestamp: " +
      "per-row-distinct dates still land one file per partition") {
    withCatalog { (cat, wh) =>
      val t = s"$wh/facts/t"
      // every row a DISTINCT timestamp (the sf0.1 orders shape that broke
      // source-column clustering: hashing the raw date splinters a month
      // across clusters, and the local sort then cuts one file per month
      // RUN inside every task — 317 files for 80 months)
      val df = spark.range(3200)
        .select(
          col("id"),
          expr("timestamp'2024-01-01 00:00:00' + make_interval(0, cast(id % 8 as int), 0, 0, 0, cast(id as int))")
            .alias("ts"),
          (col("id") * 3L).alias("v"))
      SnapshotStore.partitionedCommit(
        df.limit(0), t, Seq(PartitionSpec.PartField("months", "ts")))
      df.repartition(16).createOrReplaceTempView("graft_wdist_src_distinct")
      withMode("hash") {
        spark.sql(s"INSERT INTO $cat.facts.t SELECT * FROM graft_wdist_src_distinct")
      }
      val perPart = newFilesByPartition(t, 1L)
      assert(perPart.size === 8, s"8 month partitions, got $perPart")
      assert(perPart.values.forall(_ === 1),
        s"derived-value clustering must land ONE file per month: $perPart")
      val got = spark.read.format("graft-snapshot").option("path", t).load()
        .agg(count(lit(1)), sum(col("v")), countDistinct(col("ts"))).collect()(0)
      val want = df.agg(count(lit(1)), sum(col("v")), countDistinct(col("ts"))).collect()(0)
      assert(got === want, "clustering must never change answers")
    }
  }

  test("default mode keeps today's no-shuffle behavior: many files per partition") {
    withCatalog { (cat, wh) =>
      val t = s"$wh/facts/t"
      SnapshotStore.partitionedCommit(
        adversarial().limit(0), t, Seq(PartitionSpec.PartField("months", "ts")))
      adversarial().createOrReplaceTempView("graft_wdist_src2")
      spark.sql(s"INSERT INTO $cat.facts.t SELECT * FROM graft_wdist_src2")
      val perPart = newFilesByPartition(t, 1L)
      assert(perPart.size === 8)
      assert(perPart.values.sum > 16,
        s"16 adversarial tasks × 8 months must fragment without a distribution: $perPart")
    }
  }

  test("range mode: one file per partition AND cross-file source-column non-overlap") {
    withCatalog { (cat, wh) =>
      val t = s"$wh/facts/t"
      SnapshotStore.partitionedCommit(
        adversarial().limit(0), t, Seq(PartitionSpec.PartField("months", "ts")))
      adversarial().createOrReplaceTempView("graft_wdist_src3")
      withMode("range") {
        spark.sql(s"INSERT INTO $cat.facts.t SELECT * FROM graft_wdist_src3")
      }
      val perPart = newFilesByPartition(t, 1L)
      assert(perPart.size === 8 && perPart.values.forall(_ === 1), s"$perPart")
      // global order ⇒ per-file [min,max] of the source column never overlap
      val prev = SnapshotStore.dataFiles(
        spark, SnapshotStore.manifest(spark, t, 0L)).toSet
      val spans = SnapshotStore.dataFiles(spark, SnapshotStore.manifest(spark, t, 1L))
        .filterNot(prev).map { f =>
          val r = spark.read.parquet(f)
            .agg(min(col("ts")), max(col("ts"))).collect()(0)
          (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
        }.sortBy(_._1)
      spans.sliding(2).foreach {
        case Seq((_, hi), (lo, _)) =>
          assert(hi <= lo, s"range-distributed files must not overlap: $spans")
        case _ =>
      }

      val got = spark.read.format("graft-snapshot").option("path", t).load().count()
      assert(got === adversarial().count())
    }
  }

  test("a tighter advisory splits a hot partition into more files") {
    withCatalog { (cat, wh) =>
      val t = s"$wh/facts/t"
      // hot-month shape with an incompressible payload so the shuffle
      // carries real bytes for the advisory to split on
      def hot(n: Int) = spark.range(n)
        .select(col("id"), lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00")).alias("ts"),
          md5(concat(lit("wdist"), col("id").cast("string"))).alias("payload"))
      SnapshotStore.partitionedCommit(
        hot(0), t, Seq(PartitionSpec.PartField("months", "ts")))
      hot(50000).repartition(16).createOrReplaceTempView("graft_wdist_hot")
      spark.conf.set("spark.graft.write.targetFileSizeBytes", (256L * 1024).toString)
      try withMode("hash") {
        spark.sql(s"INSERT INTO $cat.facts.t SELECT * FROM graft_wdist_hot")
      } finally spark.conf.unset("spark.graft.write.targetFileSizeBytes")
      val perPart = newFilesByPartition(t, 1L)
      assert(perPart.size === 1, s"one hot month: $perPart")
      assert(perPart.values.head > 1,
        s"a 50k-row month above a 256 KiB advisory must split: $perPart")
    }
  }

  test("bucketed layout ignores the mode: bucket contract wins, tag survives") {
    withCatalog { (cat, wh) =>
      val t = s"$wh/facts/b"
      SnapshotStore.bucketedCommit(
        Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), t, Seq("k"), 4)
      withMode("hash") {
        spark.sql(s"INSERT INTO $cat.facts.b VALUES (CAST(4 AS BIGINT), CAST(40 AS BIGINT))")
      }
      val m = SnapshotStore.manifest(spark, t, 1L)
      assert(m.bucketCols === Seq("k") && m.bucketN === 4,
        "the bucket layout must survive an INSERT under a distribution mode")
      assert(spark.read.format("graft-snapshot").option("path", t).load().count() === 4)
    }
  }

  test("an unknown mode refuses loudly at write planning") {
    withCatalog { (cat, wh) =>
      val t = s"$wh/facts/t"
      SnapshotStore.partitionedCommit(
        adversarial().limit(0), t, Seq(PartitionSpec.PartField("months", "ts")))
      adversarial().limit(10).createOrReplaceTempView("graft_wdist_src4")
      val e = intercept[Exception] {
        withMode("zorder") {
          spark.sql(s"INSERT INTO $cat.facts.t SELECT * FROM graft_wdist_src4")
        }
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("none|hash|range")), s"got: ${msgs(e)}")
    }
  }
}
