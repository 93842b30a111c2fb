package graft

import org.apache.spark.sql.SparkSession

/** Dev-only per-query profiler (not a driver surface): times named gate
  * queries with the same forced-full-evaluation sink as Bench, two runs
  * each (cold parquet scan, then warm page cache), clearing persisted
  * intermediates between runs.
  *
  * Usage: runMain graft.Profile [sfDir] [queryName ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    names.foreach { n =>
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        Bench.force(SparkEntry.queries(n)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"PROFILE $n%-24s run$run%d  $dt%8.3f s")
      }
    }
    spark.stop()
  }
}
