package graft.queries

/** Per-(kind, input-dir) fixture cache for queries that must
  * MATERIALIZE a table (snapshot commits, z-ordered layouts, Bloom
  * indexes, loose files) before the operator under test can READ it.
  *
  * The build closure runs ONCE per JVM per scale-factor dir; every
  * later invocation reuses the path. Two effects that matter:
  *  - the bench's repeated runs (medians of 3) measure the READ path —
  *    the number the 100 TB design argument is about — instead of
  *    being dominated by the fixture's full-table write;
  *  - repeated sweeps stop accumulating one orphaned temp dir per
  *    invocation (3 benches × N queries of disk pressure).
  *
  * Correctness is unchanged: every build closure is deterministic in
  * its (kind, dir) key, and ALL mutation (commits, deletes, merges)
  * must live inside the closure so that a cache hit observes exactly
  * the state a fresh build would produce. Keyed by the input dir so
  * sf ladders never cross-contaminate.
  */
object Fixtures {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A fixture TABLE path (`<tmp>/t`), built once by `build`. */
  def table(kind: String, sfDir: String)(build: String => Unit): String =
    cache.computeIfAbsent(s"$kind|$sfDir", { _ =>
      val t = java.nio.file.Files.createTempDirectory(kind).toString + "/t"
      build(t)
      t
    })

  /** A fixture DIRECTORY (warehouse roots, loose-file dirs). */
  def dir(kind: String, sfDir: String)(build: String => Unit): String =
    cache.computeIfAbsent(s"$kind|$sfDir", { _ =>
      val root = java.nio.file.Files.createTempDirectory(kind).toString
      build(root)
      root
    })
}
