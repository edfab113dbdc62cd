package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Version TAGS: named immutable pointers to committed versions that
  * (1) resolve anywhere a version number does — reader option,
  * catalog `VERSION AS OF` — and (2) pin their version through vacuum
  * until dropped. The "snapshot we trained model X on" survives a
  * 7-day retention policy by name. */
class SnapshotTagsSpec extends SparkSuite {

  private def freshTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("tags resolve through the reader option and pin vacuum retention") {
    val table = freshTable("tags")
    val nation = graft.sources.Tables.nation(spark, sf())
    SnapshotStore.commit(nation, table)           // v0
    SnapshotStore.createTag(spark, table, "train-run-7") // pins v0
    SnapshotStore.commit(nation.limit(10), table) // v1
    SnapshotStore.commit(nation.limit(5), table)  // v2
    SnapshotStore.commit(nation.limit(2), table)  // v3

    val dropped = SnapshotStore.vacuum(spark, table, keep = 2)
    assert(dropped === Seq(1L), "v0 is tagged (pinned); v1 ages out; v2, v3 retained")
    assert(SnapshotStore.versions(spark, table) === Seq(0L, 2L, 3L))

    // resolution by name, full content intact after vacuum
    val byTag = spark.read.format("graft-snapshot")
      .option("path", table).option("version", "train-run-7").load()
    assert(byTag.count() === 25)
    assert(byTag.agg(sum(col("n_nationkey"))).head().getLong(0)
      === nation.agg(sum(col("n_nationkey"))).head().getLong(0))
  }

  test("catalog VERSION AS OF accepts a tag name; $tags lists them") {
    val wh = java.nio.file.Files.createTempDirectory("tags-wh").toString
    val cat = "gtag_" + java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      val table = s"$wh/dims/nation"
      val nation = graft.sources.Tables.nation(spark, sf())
      SnapshotStore.commit(nation, table) // v0
      SnapshotStore.commit(nation.limit(3), table) // v1 (head)
      spark.sql(s"CALL $cat.system.create_tag(table => 'dims.nation', name => 'golden', version => 0)")

      val n = spark.sql(s"SELECT count(*) FROM $cat.dims.nation VERSION AS OF 'golden'")
        .head().getLong(0)
      assert(n === 25, "tag must resolve to the pinned version, not the head")
      assert(spark.sql(s"SELECT count(*) FROM $cat.dims.nation").head().getLong(0) === 3)

      val tags = spark.sql(s"SELECT tag, version FROM $cat.dims.`nation$$tags`").collect()
      assert(tags.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("golden", 0L)))

      spark.sql(s"CALL $cat.system.drop_tag(table => 'dims.nation', name => 'golden')")
      val e = intercept[Exception] {
        spark.sql(s"SELECT count(*) FROM $cat.dims.nation VERSION AS OF 'golden'").collect()
      }
      assert(Option(e.getMessage).getOrElse("").nonEmpty)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("tags are immutable; unknown specs fail loudly; names validate") {
    val table = freshTable("tags-imm")
    SnapshotStore.commit(graft.sources.Tables.nation(spark, sf()), table)
    SnapshotStore.createTag(spark, table, "r1")
    val dup = intercept[IllegalStateException] {
      SnapshotStore.createTag(spark, table, "r1")
    }
    assert(dup.getMessage.contains("immutable"))
    val unknown = intercept[IllegalArgumentException] {
      SnapshotStore.resolveVersionSpec(spark, table, "nope")
    }
    assert(unknown.getMessage.contains("not a number and not a tag"))
    intercept[IllegalArgumentException] {
      SnapshotStore.createTag(spark, table, ".hidden")
    }
    intercept[IllegalArgumentException] {
      SnapshotStore.createTag(spark, table, "a/b")
    }
    // dropping frees the name for re-pointing
    assert(SnapshotStore.dropTag(spark, table, "r1"))
    SnapshotStore.createTag(spark, table, "r1", 0L)
    assert(SnapshotStore.tags(spark, table) === Map("r1" -> 0L))
  }
}
