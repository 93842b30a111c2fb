package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** Per-round benchmark main: times every SparkEntry query on the scale
  * factor in SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":...,"value":total,"unit":"sec","queries":{...},"sf":...}.
  */
object Bench {

  /** Force FULL evaluation of every output column: aggregate an xxhash64
    * over all columns of every row (combined with bit_xor — overflow-free
    * under ANSI). A bare `count()` lets Catalyst prune unreferenced
    * projections, so map-only queries would time the scan instead of
    * their expressions.
    */
  def force(df: DataFrame): Long = {
    val r = df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(bit_xor(col("h"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the JVM/codegen paths once so the first timed query doesn't
    // absorb all of Spark's startup cost
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try force(SparkEntry.queries.head._2(spark, sfDir))
    catch { case _: Throwable => () }

    // calibrate BEFORE the timed loop (and again after): the pair
    // brackets the host's delivered CPU across the run, and the mean is
    // what the normalized walls divide by. Thread count follows the
    // session's actual parallelism, never a hardcoded 32 — on a
    // different host the key name and value must describe that host.
    val nThreads = cpus.toInt
    val calibStart = HostCalib.measure(nThreads)
    var calibEnd = -1.0 // measured after the loop

    // Multiple runs per query, keep the fastest: a single run is hostage
    // to transient host load (observed 2-4x swings between rounds on an
    // otherwise identical build). The reps are INTERLEAVED — the full
    // suite runs `reps` times and each query keeps its min across passes —
    // so a multi-second contention window on the host degrades at most one
    // pass's sample of a query, not all of them (back-to-back reps of the
    // same query share the same window and min-of-2 then measures the
    // contention, not the work; observed as a 22 s dd2b in an otherwise
    // ~2 s build). A failed run poisons the query's time to a negative
    // sentinel.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    // record host load around the run: apparent cross-round regressions
    // have repeatedly been pure host contention (same binaries, 1.1-1.5x
    // uniform drift), so regression triage needs the load signal IN the
    // artifact, not reconstructed after the fact
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadStart = loadAvg
    var loadPeak = loadStart
    for (_ <- 1 to reps; (name, fn) <- names) {
      val t0 = System.nanoTime()
      val ok = try { force(fn(spark, sfDir)); true }
        catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop persisted intermediates so one query's cache can't squeeze
      // the execution memory of the queries after it
      spark.catalog.clearCache()
      samples(name) = (if (ok) dt else -1.0) :: samples.getOrElse(name, Nil)
      loadPeak = math.max(loadPeak, loadAvg)
    }
    calibEnd = HostCalib.mops(nThreads)
    val results = names.map { case (name, _) =>
      val times = samples(name)
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    // millisecond precision keeps the line compact; java.util.Locale.ROOT
    // so a host locale can't swap the decimal separator mid-JSON
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Mops-normalized walls: wall × (delivered_mops / ref_mops), i.e.
    // "what this wall would read on the reference host". RefMops is the
    // round-15 quiet-baseline host's measured all-core throughput
    // (~15500 M mix-ops/s at 32 threads — the run both the stored
    // BASELINE subset and BENCH_LOCAL @c05dd6c were taken on), so
    // cross-round regression triage starts from normalized numbers
    // instead of hand-waving host load. Normalization uses the
    // start/end calibration MEAN; if either measurement hit the stall
    // sentinel the normalized fields are emitted as -1 (unusable).
    val RefMops = 15500.0
    val calibMean =
      if (calibStart.mopsNt > 0 && calibEnd > 0)
        (calibStart.mopsNt + calibEnd) / 2.0
      else -1.0
    val normFactor = if (calibMean > 0) calibMean / RefMops else -1.0
    def norm(v: Double): Double =
      if (v < 0 || normFactor <= 0) -1.0 else v * normFactor
    val qsNorm = results.map { case (k, v) => s"\"" + k + "\":" + f(norm(v)) }
      .mkString("{", ",", "}")
    val loadJson = s""""load_avg_start":${f(loadStart)},""" +
      s""""load_avg_peak":${f(loadPeak)},"load_avg_end":${f(loadAvg)},""" +
      calibStart.json +
      s""","host_mops_${nThreads}t_end":""" +
      "%.1f".formatLocal(java.util.Locale.ROOT, calibEnd) +
      s""","ref_mops":${f(RefMops)},"norm_factor":${f(normFactor)}"""
    val line =
      s"""{"metric":"total","value":${f(total)},"unit":"sec",""" +
        s""""value_norm":${f(norm(total))},$loadJson,"queries":$qs,""" +
        s""""queries_norm":$qsNorm,"sf":"$sfDir"}"""
    println(line)
    // ALSO persist to a file: the driver's stdout capture keeps only a
    // bounded tail, so the printed line alone can be lost mid-stream
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), line + "\n")
    catch { case _: Throwable => () }
    // quiet-run hygiene: BENCH_LOCAL.json is overwritten by whichever
    // run executed LAST (a contended driver run can clobber a quiet
    // builder run), so a run on a genuinely quiet host also writes the
    // QUIET artifact — commit discipline keeps that one canonical.
    // "Quiet" is judged by DELIVERED throughput (the calibration
    // bracket), not load average: an idle-by-load host under a noisy
    // hypervisor still delivers degraded CPU (observed: load 0.x with
    // norm_factor 0.814), and load can't see that. norm_factor >= 0.9
    // means the bracket-mean delivery was within 10% of the reference
    // host's.
    if (normFactor >= 0.9)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_LOCAL_QUIET.json"), line + "\n")
      catch { case _: Throwable => () }
    // The driver artifact stores only the LAST ~2000 chars of stdout and
    // parses the bench line out of that window; with 100+ gate queries
    // the full line is ~4.5 KB, so its head falls outside the window and
    // every round's artifact records parsed=null (full data survives only
    // in BENCH_LOCAL.json). Emit, as the FINAL stdout line, a compact
    // variant guaranteed to fit: same schema, `queries` trimmed to the
    // most expensive entries within a hard character budget (the ones a
    // per-query comparison cares about), with an explicit pointer at the
    // full artifact.
    val budget = 1500
    val byCost = results.sortBy { case (_, v) => -v }
    val picked = Seq.newBuilder[String]
    var used = 0
    var kept = 0
    byCost.foreach { case (k, v) =>
      val entry = "\"" + k + "\":" + f(v)
      if (used + entry.length + 1 <= budget) {
        picked += entry; used += entry.length + 1; kept += 1
      }
    }
    val compact = s"""{"metric":"total","value":${f(total)},"unit":"sec",""" +
      s""""value_norm":${f(norm(total))},$loadJson,""" +
      s""""n_queries":${results.size},"queries_kept":$kept,""" +
      s""""queries_full":"BENCH_LOCAL.json",""" +
      s""""queries":${picked.result().mkString("{", ",", "}")},""" +
      s""""sf":"$sfDir"}"""
    println(compact)
    spark.stop()
  }
}
