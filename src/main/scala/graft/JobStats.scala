package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev utility (not a driver surface): run named SparkEntry queries once
  * each and print DETERMINISTIC execution-shape counters — jobs, stages,
  * tasks, shuffle read/write records and bytes — via a SparkListener.
  * Host-load noise moves walls 2-4x between runs; these counters are what
  * the shuffle/round optimizations actually change, so before/after
  * comparisons of them are exact.
  *
  * Usage: runMain graft.JobStats [sfDir] <queryName ...>
  */
object JobStats {
  final class Agg extends SparkListener {
    val jobsStarted = new AtomicInteger
    val jobsEnded = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufWriteBytes = new AtomicLong
    val shufWriteRecords = new AtomicLong
    val shufReadBytes = new AtomicLong
    val shufReadRecords = new AtomicLong
    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobsStarted.incrementAndGet()
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobsEnded.incrementAndGet()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(e.stageInfo.numTasks)
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        shufWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufWriteRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        shufReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufReadRecords.addAndGet(m.shuffleReadMetrics.recordsRead)
      }
    }
    def reset(): Unit = {
      jobsStarted.set(0); jobsEnded.set(0); stages.set(0); tasks.set(0)
      shufWriteBytes.set(0); shufWriteRecords.set(0)
      shufReadBytes.set(0); shufReadRecords.set(0)
    }
    def settle(): Unit = {
      // listener events arrive async; wait for starts == ends and a beat
      var i = 0
      while (jobsStarted.get() != jobsEnded.get() && i < 50) {
        Thread.sleep(100); i += 1
      }
      Thread.sleep(300)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobStats [sfDir] <queryName>...")
    val (sfDir, names) =
      if (args.head.startsWith("/")) (args.head, args.tail.toSeq)
      else ("/root/testdata/sf0.1", args.toSeq)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    names.foreach { n =>
      Thread.sleep(400) // drain stragglers from the previous query
      agg.reset()
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(n)(spark, sfDir))
      val dt = (System.nanoTime() - t0) / 1e9
      agg.settle()
      spark.catalog.clearCache()
      println(f"JOBSTATS $n%-34s jobs=${agg.jobsEnded.get}%3d " +
        f"stages=${agg.stages.get}%4d tasks=${agg.tasks.get}%5d " +
        f"shufW=${agg.shufWriteRecords.get}%9d recs/${agg.shufWriteBytes.get}%10d B " +
        f"shufR=${agg.shufReadRecords.get}%9d recs  wall=$dt%7.3f s")
    }
    spark.stop()
  }
}
