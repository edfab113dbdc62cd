package graft.tools

import graft.sources.Tables
import graft.store.SnapshotStore

import org.apache.spark.sql.functions._

/** Measures what file-granular manifests buy a small MERGE: the SQL
  * copy-on-write path (rewrites TOUCHED files only) against the
  * API-level full-rewrite merge (`ChangeData.mergeCommit`) on the same
  * narrow update batch over the same range-partitioned snapshot.
  *
  * Usage: runMain graft.tools.MergeBench <sfDir> [files] [batchRows]
  */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Sessions.local("graft-mergebench")
    val files = args.lift(1).map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism.max(4))
    val batch = args.lift(2).map(_.toInt).getOrElse(100)
    val orders = Tables.orders(spark, sfDir)
    val n = orders.count()
    val lo = orders.agg(min(col("o_orderkey"))).head().getLong(0)

    val wh = java.nio.file.Files.createTempDirectory("mergebench").toString
    val cat = "gmb_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)

    def freshTable(name: String): String = {
      val t = s"$wh/facts/$name"
      SnapshotStore.commit(orders.repartitionByRange(files, col("o_orderkey")), t)
      t
    }
    spark.range(0, batch)
      .selectExpr(s"id + $lo AS o_orderkey", "'PATCHED' AS o_priority")
      .createOrReplaceTempView("mb_src")

    // copy-on-write SQL MERGE (touched files only)
    val t1 = freshTable("cow")
    val c0 = System.nanoTime()
    spark.sql(
      s"""MERGE INTO $cat.facts.cow t USING mb_src s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED THEN UPDATE SET t.o_orderpriority = s.o_priority""")
    val cowSec = (System.nanoTime() - c0) / 1e9
    val m = SnapshotStore.manifest(spark, t1, 1L)
    val v0Files = SnapshotStore.dataFiles(spark, SnapshotStore.manifest(spark, t1, 0L)).toSet
    val replaced = v0Files.diff(m.files.toSet).size

    // full-rewrite merge (the pre-round-11 shape)
    val t2 = freshTable("full")
    val f0 = System.nanoTime()
    // inserts can never fire (every source key exists) but mergeInto
    // builds the insert projection eagerly — typed nulls satisfy it
    val insertNulls = orders.schema.fields
      .filterNot(f => Set("o_orderkey", "o_orderpriority").contains(f.name))
      .map(f => f.name -> lit(null).cast(f.dataType)).toMap ++
      Map("o_orderpriority" -> col("__s.o_priority"))
    graft.ops.ChangeData.mergeCommit(spark, t2,
      spark.table("mb_src").selectExpr("o_orderkey", "o_priority"),
      Seq("o_orderkey"),
      updateSet = Map("o_orderpriority" -> col("__s.o_priority")),
      insertValues = insertNulls,
      broadcastSource = true)
    val fullSec = (System.nanoTime() - f0) / 1e9

    println(f"rows=$n files=$files batch=$batch")
    println(f"cow_merge_sec=$cowSec%.2f (replaced $replaced/${v0Files.size} files)")
    println(f"full_rewrite_merge_sec=$fullSec%.2f")
    println(f"speedup=${fullSec / cowSec}%.1f x")
    spark.stop()
  }
}
