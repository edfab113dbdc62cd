package graft.tools

import graft.Sessions
import graft.store.SnapshotStore
import org.apache.spark.sql.functions._

/** Scale probe for the round-11 second-session surfaces:
  *
  *  1. METADATA-ONLY DELETE vs the copy-on-write fallback on the same
  *     table — the retention shape (`DELETE o_orderdate >= cut`) drops
  *     whole files as a manifest edit, so its wall time should be
  *     ~flat in table size while copy-on-write pays a full read+write
  *     of every touched file.
  *  2. BATCH CHANGE-FEED read of ONE append delta from a large table —
  *     O(new files), so ~flat in table size too.
  *
  * Usage: `runMain graft.tools.MdeleteBench <sfDir>`
  * Prints one line per measurement: `name=<sec>`.
  */
object MdeleteBench {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-mdelete-bench")
    val orders = graft.sources.Tables.orders(spark, sfDir)
    val files = spark.sparkContext.defaultParallelism.max(8)
    val cut = "1997-01-01"

    // one catalog NAME per table: Spark caches catalog instances by
    // name, so re-pointing a live catalog's warehouse conf is a no-op
    def catalogFor(tag: String, wh: String): String = {
      val cat = s"gmb$tag"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.SnapshotCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      cat
    }

    def freshTable(tag: String): (String, String) = {
      val wh = java.nio.file.Files.createTempDirectory(s"mdb-$tag").toString
      val t = s"$wh/facts/orders"
      SnapshotStore.commit(
        orders.filter(col("o_orderdate") < lit(cut).cast("date")).repartition(files), t)
      SnapshotStore.appendCommit(
        orders.filter(col("o_orderdate") >= lit(cut).cast("date")).repartition(files), t)
      (t, catalogFor(tag, wh))
    }

    // 1a. metadata-only: the date predicate splits exactly at the
    // append boundary → every file classifies → manifest edit
    val (t1, cat1) = freshTable("meta")
    val (_, metaSec) = timed {
      spark.sql(s"DELETE FROM $cat1.facts.orders WHERE o_orderdate >= DATE'$cut'")
    }
    val op1 = SnapshotStore.manifest(spark, t1,
      SnapshotStore.currentVersion(spark, t1).get).op
    println(f"metadata_delete_sec=$metaSec%.3f op=$op1")

    // 1b. copy-on-write: a key-modulo predicate is ambiguous in every
    // file → the row-level plan rewrites each touched file
    val (t2, cat2) = freshTable("cow")
    val (_, cowSec) = timed {
      spark.sql(s"DELETE FROM $cat2.facts.orders WHERE o_orderkey % 2 = 0")
    }
    val op2 = SnapshotStore.manifest(spark, t2,
      SnapshotStore.currentVersion(spark, t2).get).op
    println(f"cow_delete_sec=$cowSec%.3f op=$op2")

    // 2. batch CDF: read ONLY v1's append delta (never the v0 image)
    val (t3, _) = freshTable("cdf")
    val (n, cdfSec) = timed {
      spark.read.format("graft-snapshot").option("path", t3)
        .option("changeFeed", "true").option("startingVersion", "1").load()
        .agg(count(lit(1))).head().getLong(0)
    }
    println(f"batch_cdf_delta_sec=$cdfSec%.3f rows=$n")

    // control: full-table scan of the same snapshot, for the O(delta)
    // vs O(table) comparison
    val (total, scanSec) = timed {
      spark.read.format("graft-snapshot").option("path", t3).load()
        .agg(count(lit(1))).head().getLong(0)
    }
    println(f"full_scan_sec=$scanSec%.3f rows=$total")

    // 3. small MERGE both ways: 100 updated keys against the full
    // table. Copy-on-write rewrites every touched FILE (hash layout →
    // all of them); merge-on-read writes ~100 keys + one small file.
    def mergeBench(tag: String, mor: Boolean): Unit = {
      val (t, c) = freshTable(tag)
      orders.select(col("o_orderkey")).orderBy(col("o_orderkey")).limit(100)
        .createOrReplaceTempView(s"mdb_src_$tag")
      if (mor) {
        spark.conf.set("spark.graft.rowlevel.mode", "merge-on-read")
        spark.conf.set("spark.graft.rowlevel.keys", "o_orderkey")
      }
      try {
        val (_, sec) = timed {
          spark.sql(
            s"""MERGE INTO $c.facts.orders t USING mdb_src_$tag s
                ON t.o_orderkey = s.o_orderkey
                WHEN MATCHED THEN UPDATE SET o_orderpriority = 'X-PATCHED'""")
        }
        val op = SnapshotStore.manifest(spark, t,
          SnapshotStore.currentVersion(spark, t).get).op
        println(f"merge_${if (mor) "mor" else "cow"}_sec=$sec%.3f op=$op")
      } finally if (mor) {
        spark.conf.unset("spark.graft.rowlevel.mode")
        spark.conf.unset("spark.graft.rowlevel.keys")
      }
    }
    mergeBench("mcow", mor = false)
    mergeBench("mmor", mor = true)
    spark.stop()
  }
}
