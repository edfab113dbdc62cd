package graft.sources

/** Read-only planning diagnostics exposed to tools/benchmarks (the
  * scan internals stay `private[sources]`). */
object SnapshotScanProbe {
  /** Cumulative data-file footer opens performed by driver-side
    * planning since JVM start (0 delta per query = sidecar-planned). */
  def plannerFooterReads: Long = SnapshotScan.plannerFooterReads.get()
}
