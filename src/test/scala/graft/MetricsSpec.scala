package graft

/** QueryExecutionListener → Metrics bridge: completed actions surface as
  * query_execution_time samples with scan-row tags.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("listener records action wall time and scan rows") {
    val l = MetricsListener.install(spark)
    try {
      Metrics.reset()
      val dir = tmpDir("metrics")
      Seq(1L, 2L, 3L).toDF("x").write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir).where($"x" > 1L).collect()
      // listener callbacks are async — poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      def got = Metrics.snapshot()
        .filter(_.metric == "query_execution_time")
        .filter(_.tags.get("action").contains("collect"))
      while (got.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(got.nonEmpty, "collect action recorded")
      assert(got.exists(_.tags.get("scan_rows").exists(_.toLong >= 1L)),
        s"scan rows tagged: ${got.map(_.tags)}")
      assert(got.forall(_.seconds > 0.0))
    } finally MetricsListener.uninstall(spark, l)
  }

  test("scan rows surface through AQE-compiled plans") {
    val l = MetricsListener.install(spark)
    try {
      Metrics.reset()
      val dir = tmpDir("metrics_aqe")
      (1L to 100L).toDF("x").write.mode("overwrite").parquet(dir)
      // join + aggregate => exchanges => AdaptiveSparkPlanExec root
      val t = spark.read.parquet(dir)
      t.join(t.withColumnRenamed("x", "y"), $"x" === $"y")
        .groupBy($"x" % 10).count().collect()
      val deadline = System.nanoTime() + 10e9.toLong
      def got = Metrics.snapshot()
        .filter(_.metric == "query_execution_time")
        .filter(_.tags.get("scan_rows").exists(_.toLong >= 200L))
      while (got.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(got.nonEmpty,
        s"AQE scans counted: ${Metrics.snapshot().map(_.tags)}")
    } finally MetricsListener.uninstall(spark, l)
  }
}
