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
  private val buildSecs = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Seconds each fixture's ONE-TIME build took, keyed `kind|sfDir` —
    * the bench publishes this so fixture setup is attributed separately
    * from the measured query time (a read-path regression can't hide
    * behind write noise). */
  def buildTimes: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }

  /** A fixture TABLE path (`<tmp>/t`), built once by `build`. */
  def table(kind: String, sfDir: String)(build: String => Unit): String =
    cache.computeIfAbsent(s"$kind|$sfDir", { key =>
      val t0 = System.nanoTime()
      val t = java.nio.file.Files.createTempDirectory(kind).toString + "/t"
      build(t)
      buildSecs.put(key, (System.nanoTime() - t0) / 1e9)
      t
    })

  /** A fixture DIRECTORY (warehouse roots, loose-file dirs). */
  def dir(kind: String, sfDir: String)(build: String => Unit): String =
    cache.computeIfAbsent(s"$kind|$sfDir", { key =>
      val t0 = System.nanoTime()
      val root = java.nio.file.Files.createTempDirectory(kind).toString
      build(root)
      buildSecs.put(key, (System.nanoTime() - t0) / 1e9)
      root
    })
}
