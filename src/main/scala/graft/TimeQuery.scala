package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual SparkEntry queries standalone, N reps
  * each, without the full Bench sweep. Usage:
  *   runMain graft.TimeQuery <query>... [env SPARK_GRAFT_SF_DIR, _REPS]
  * Prints one line per rep plus the min — the number Bench would keep.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_TIME_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup
    for (name <- args) {
      val fn = SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query: $name"))
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        Bench.force(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name rep$i $dt%.3f s")
        spark.catalog.clearCache()
        dt
      }
      println(f"$name min ${times.min}%.3f s")
    }
    spark.stop()
  }
}
