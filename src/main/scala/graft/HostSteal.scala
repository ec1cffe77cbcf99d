package graft

/** Host-steal instrumentation for benchmark attribution.
  *
  * On a shared hypervisor (this container runs under one), /proc/stat's
  * steal column counts time vCPUs were runnable but not scheduled by the
  * host — CPU the guest asked for and did not get. The r14 isolated A/B
  * hunt for the r13 "monotone cross-round drift" (q_pagerank
  * 2.09 → 2.44 → ~4.0 s across closes on unchanged code) found reps of
  * IDENTICAL work varying 4.4 → 37.3 s back-to-back, with the inflation
  * tracking this counter almost exactly (4.40 s at steal 0.3 CPU-s — the
  * historical sweep reading — vs 37.29 s at steal 41.0 CPU-s). Wall time
  * on this machine is therefore only interpretable NEXT TO the steal
  * delta: a mover whose reps all carry heavy steal is the host's epoch,
  * not the plan. Bench and QTime sample this around every measurement.
  */
object HostSteal {
  /** Cumulative steal across all CPUs in seconds (USER_HZ = 100 ticks/s),
    * or -1 if unreadable (non-Linux / no steal column). */
  def stealSeconds(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val cols = src.getLines().next().trim.split("\\s+")
        if (cols.length > 8) cols(8).toLong / 100.0 else -1.0
      } finally src.close()
    } catch { case _: Throwable => -1.0 }
}
