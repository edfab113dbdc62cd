package graft.sources

import graft.SparkSuite
import graft.store.SnapshotStore
import org.apache.spark.sql.functions._

/** Change-feed ADMISSION CONTROL (`maxFilesPerTrigger`): a stream that
  * starts against a long commit history (or falls behind) drains it in
  * budget-sized micro-batches of whole commits instead of one
  * unbounded batch — and `Trigger.AvailableNow` pins the catch-up
  * target once, then honors the budget batch by batch. */
class SnapshotStreamRateLimitSpec extends SparkSuite {

  private def freshTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("maxFilesPerTrigger splits catch-up into whole-commit batches") {
    val table = freshTable("ratelimit")
    val ckpt = java.nio.file.Files.createTempDirectory("ratelimit-ckpt").toString
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation.repartition(2), table) // v0 image: 2 files
    def appendOne(shift: Int): Unit = SnapshotStore.appendCommit(
      nation.select(col("n_nationkey") + shift, col("n_name"), col("n_regionkey"))
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .filter(col("n_regionkey") === 2).coalesce(1), table) // 1 file, 5 rows
    appendOne(100) // v1
    appendOne(200) // v2
    appendOne(300) // v3

    val q = spark.readStream.format("graft-snapshot")
      .option("path", table).option("changeFeed", "true")
      .option("maxFilesPerTrigger", "2").load()
      .writeStream.format("memory").queryName("graft_cdf_rate")
      .option("checkpointLocation", ckpt).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000)
    finally q.stop()

    // exactly-once content: the v0 image + every append delta
    val rows = spark.table("graft_cdf_rate").collect()
    def ct(r: org.apache.spark.sql.Row) = r.getString(r.fieldIndex("_change_type"))
    assert(rows.count(ct(_) == "snapshot") === 25)
    assert(rows.count(ct(_) == "insert") === 15)
    assert(rows.length === 40)

    // batch shape: v0 exhausts the 2-file budget alone; v1+v2 share a
    // batch (1+1 files); v3 lands in a third
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batches = fs.listStatus(new org.apache.hadoop.fs.Path(s"$ckpt/offsets"))
      .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toInt).sorted
    assert(batches.length === 3,
      s"expected 3 admission-bounded micro-batches, got ${batches.toSeq}")
  }

  test("a rate-limited stream behind vacuum hits the retention guard, not a raw crash") {
    val table = freshTable("ratelimit-vac")
    val ckpt = java.nio.file.Files.createTempDirectory("ratelimit-vac-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("ratelimit-vac-out").toString
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table) // v0
    def start() = spark.readStream.format("graft-snapshot")
      .option("path", table).option("changeFeed", "true")
      .option("maxFilesPerTrigger", "1").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // checkpoint at v0
    SnapshotStore.commit(nation.limit(10), table) // v1
    SnapshotStore.commit(nation.limit(5), table)  // v2
    SnapshotStore.commit(nation.limit(2), table)  // v3
    SnapshotStore.vacuum(spark, table, keep = 2)  // v1 gone; checkpoint needs it
    val q2 = start()
    val e = intercept[Exception] { q2.processAllAvailable() }
    try {
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      val all = msgs(e).mkString(" | ")
      assert(all.contains("vacuum retention"),
        s"the rate-limited walk must surface the retention guard, not a raw " +
          s"missing-manifest error: $all")
    } finally q2.stop()
  }

  test("a commit bigger than the budget still admits (no stall), alone") {
    val table = freshTable("ratelimit-big")
    val ckpt = java.nio.file.Files.createTempDirectory("ratelimit-big-ckpt").toString
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation.repartition(4), table) // v0 image: 4 files > budget 1
    SnapshotStore.appendCommit(nation.limit(3).coalesce(1), table) // v1: 1 file

    val q = spark.readStream.format("graft-snapshot")
      .option("path", table).option("changeFeed", "true")
      .option("maxFilesPerTrigger", "1").load()
      .writeStream.format("memory").queryName("graft_cdf_rate_big")
      .option("checkpointLocation", ckpt).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000)
    finally q.stop()

    val rows = spark.table("graft_cdf_rate_big").collect()
    assert(rows.length === 28, "oversized commit must still flow through whole")
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batches = fs.listStatus(new org.apache.hadoop.fs.Path(s"$ckpt/offsets"))
      .map(_.getPath.getName).filter(_.forall(_.isDigit))
    assert(batches.length === 2,
      s"oversized v0 alone, then v1: expected 2 batches, got ${batches.length}")
  }

  test("a non-numeric maxFilesPerTrigger fails naming the option, not with a raw parse error") {
    val table = freshTable("ratelimit-badopt")
    SnapshotStore.commit(graft.sources.Tables.nation(spark, sf()), table)
    val q = spark.readStream.format("graft-snapshot")
      .option("path", table).option("changeFeed", "true")
      .option("maxFilesPerTrigger", "lots").load()
      .writeStream.format("noop").start()
    val err = intercept[Exception] { q.processAllAvailable() }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ chain(e.getCause))
    assert(chain(err).exists(_.contains("maxFilesPerTrigger must be a positive integer")),
      s"want the named-option message, got: ${chain(err).mkString(" | ")}")
    q.stop()
  }
}
