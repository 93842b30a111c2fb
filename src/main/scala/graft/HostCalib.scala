package graft

/** Fixed CPU calibration for bench artifacts. Walls on this shared VM
  * swing 3–10× between runs of IDENTICAL binaries with identical
  * shuffle records (round-15 A/B: the round-14 commit re-run on the
  * same host was as slow as HEAD on the same cases minutes apart), and
  * load average is blind to the cause — our own 32 threads saturate it
  * whether the hypervisor delivers cycles or not. So every artifact
  * records the host's measured integer throughput at run time: the same
  * deterministic mix loop every round, once single-threaded and once on
  * all cores. Cross-round wall comparisons divide by this; shuffle
  * records stay the primary plan-quality metric.
  */
object HostCalib {

  /** xxhash-style integer mixing — pure ALU, no memory traffic, so the
    * measurement is CPU delivery, not cache state.
    */
  private def mixLoop(iters: Long): Long = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < iters) {
      h ^= i
      h *= 0xC2B2AE3D27D4EB4FL
      h ^= h >>> 29
      i += 1
    }
    h
  }

  // JIT sink: results folded in so the loop cannot be elided
  private val sink = new java.util.concurrent.atomic.AtomicLong

  /** Throughput in M mix-ops/s across `threads` threads (~0.3 s each).
    * Returns the sentinel −1.0 if any calibration thread fails to finish
    * inside a generous ceiling (a badly overcommitted hypervisor window
    * must degrade the calibration value, never block artifact emission
    * at the very end of an otherwise-complete bench run). Threads are
    * daemon for the same reason — a stall can't pin the JVM open.
    */
  def mops(threads: Int, itersPerThread: Long = 100000000L): Double = {
    sink.addAndGet(mixLoop(itersPerThread / 10)) // JIT warmup, untimed
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => { sink.addAndGet(mixLoop(itersPerThread)); () })
      t.setDaemon(true)
      t.start()
      t
    }
    val deadline = System.nanoTime() + 120L * 1000000000L
    ts.foreach { t =>
      t.join(math.max(1L, (deadline - System.nanoTime()) / 1000000L))
    }
    if (ts.exists(_.isAlive)) -1.0
    else threads * itersPerThread / ((System.nanoTime() - t0) / 1e9) / 1e6
  }

  /** One measured calibration point: single-thread and all-core
    * throughput, taken back to back. `json` is the artifact fragment;
    * `mopsNt` is what wall normalization divides by (see Bench).
    */
  final case class Calib(threads: Int, mops1t: Double, mopsNt: Double) {
    /** `"host_mops_1t":…,"host_mops_<n>t":…` JSON fragment (no braces).
      * Locale.ROOT like every other formatted double in the artifacts —
      * a comma-decimal host locale would otherwise emit `512,9` and
      * invalidate the whole JSON line.
      */
    def json: String =
      s""""host_mops_1t":${fmt(mops1t)},""" +
        s""""host_mops_${threads}t":${fmt(mopsNt)}"""
  }

  private def fmt(v: Double): String =
    "%.1f".formatLocal(java.util.Locale.ROOT, v)

  def measure(threads: Int): Calib = Calib(threads, mops(1), mops(threads))

  /** `"host_mops_1t":…,"host_mops_nt":…` JSON fragment (no braces). */
  def json(threads: Int): String = measure(threads).json
}
