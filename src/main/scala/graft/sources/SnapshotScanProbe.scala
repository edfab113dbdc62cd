package graft.sources

/** Read-only planning diagnostics exposed to tools/benchmarks (the
  * scan internals stay `private[sources]`). */
object SnapshotScanProbe {
  /** Cumulative data-file footer opens performed by driver-side
    * planning since JVM start (0 delta per query = sidecar-planned). */
  def plannerFooterReads: Long = SnapshotScan.plannerFooterReads.get()

  /** Row groups the most recent join-driven runtime filter dropped
    * beyond static pruning (dynamic file pruning diagnostics). */
  def lastRuntimePrunedGroups: Long = SnapshotScan.lastRuntimePrunedGroups.get()

  /** Zero the gauge before a measured query (it is set-per-scan, not
    * accumulated). */
  def resetRuntimePrunedGroups(): Unit = SnapshotScan.lastRuntimePrunedGroups.set(0)
}
