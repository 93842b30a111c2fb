package graft

import graft.catalog.VersionedCatalog
import graft.ops.SketchStats

/** Incremental column stats: per-append sketch rows committed atomically
  * with the data; whole-table quantiles from the stats table alone.
  */
class SketchStatsSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.25, 0.5, 0.75, 0.95)

  test("per-append sketches answer whole-table quantiles without " +
      "touching the data table; incremental == rebuild") {
    val cat = new VersionedCatalog(tmpDir("stats-cat"),
      layouts = _ => None, statsCols = _ => Nil)
    val rnd = new scala.util.Random(13)
    val batches = Seq.tabulate(3)(b =>
      Seq.fill(4000)((math.pow(rnd.nextDouble(), 2) * 200).toLong + b))
    batches.zipWithIndex.foreach { case (vals, i) =>
      val before = cat.currentCommit
      SketchStats.appendWithStats(cat, "facts",
        vals.toDF("v").repartition(3), Seq("v"), k = 1024, label = s"b$i")
      // data + stats land in ONE commit
      assert(cat.currentCommit == before + 1)
    }
    // one stats row per (append, column)
    assert(cat.read(spark, SketchStats.statsTable("facts")).count() == 3L)

    val got = SketchStats.quantiles(cat, spark, "facts", probs, k = 1024)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    val all = batches.flatten
    val sorted = all.sorted
    def q(p: Double): Long =
      sorted((math.max(1L, math.ceil(p * all.size.toDouble).toLong) - 1).toInt)
    assert((got._1, got._2, got._4, got._5, got._6, got._7, got._8) ==
      (("v", all.size.toLong, q(0.25), q(0.5), q(0.75), q(0.95), 0L)))
    // HLL distinct estimate: linear-counting regime, within 5% of exact
    val exactD = all.distinct.size.toLong
    assert(math.abs(got._3 - exactD).toDouble / exactD < 0.05,
      s"n_distinct ${got._3} vs exact $exactD")

    // the stats query never scans the data table's directories
    val plan = SketchStats.quantiles(cat, spark, "facts", probs, k = 1024)
      .queryExecution.executedPlan.toString
    val (_, dirs) = cat.current
    assert(dirs("facts").forall(d => !plan.contains(d)),
      "stats query must not read the data table")

    // rebuild (one full scan) agrees with the incrementally-maintained
    // answer in the exact regime
    SketchStats.rebuildStats(cat, spark, "facts", Seq("v"), k = 1024)
    assert(cat.read(spark, SketchStats.statsTable("facts")).count() == 1L)
    val rebuilt = SketchStats.quantiles(cat, spark, "facts", probs, k = 1024)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(rebuilt == got)
  }

  test("streaming maintenance: micro-batches land exactly-once (replay " +
      "is a no-op) and the maintained stats equal a batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cat = new VersionedCatalog(tmpDir("stats-stream"),
      layouts = _ => None, statsCols = _ => Nil)
    val src = MemoryStream[Long]
    val q = SketchStats.maintainStats(src.toDF().toDF("v"), cat, "facts",
        Seq("v"), k = 256)
      .option("checkpointLocation", tmpDir("stats-ckpt")).start()
    val b1 = Seq.tabulate(500)(i => (i % 40).toLong)
    val b2 = Seq.tabulate(500)(i => (i % 55).toLong + 10L)
    src.addData(b1: _*); q.processAllAvailable()
    src.addData(b2: _*); q.processAllAvailable()
    q.stop()
    assert(cat.read(spark, "facts").count() == 1000L)
    assert(cat.read(spark, SketchStats.statsTable("facts")).count() == 2L)
    // replayed batch id: no-op, nothing advances
    val commit = cat.currentCommit
    assert(!SketchStats.applyStatsBatch(b1.toDF("v"), 0L, cat, "facts",
      Seq("v"), k = 256))
    assert(cat.currentCommit == commit)
    // maintained stats == ground truth over everything ingested
    val got = SketchStats.quantiles(cat, spark, "facts", probs, k = 256)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    val all = (b1 ++ b2).sorted
    def q_(p: Double): Long =
      all((math.max(1L, math.ceil(p * all.size.toDouble).toLong) - 1).toInt)
    assert((got._1, got._2, got._4, got._5, got._6, got._7, got._8) ==
      (("v", 1000L, q_(0.25), q_(0.5), q_(0.75), q_(0.95), 0L)))
    // 65 distinct values at p=12: linear counting is exact-ish
    val exactD = all.distinct.size.toLong
    assert(math.abs(got._3 - exactD) <= 2L,
      s"n_distinct ${got._3} vs exact $exactD")
  }

  test("optimistic concurrency passes through: a stale expected commit " +
      "fails the whole append, leaving data AND stats untouched") {
    val cat = new VersionedCatalog(tmpDir("stats-cas"),
      layouts = _ => None, statsCols = _ => Nil)
    SketchStats.appendWithStats(cat, "facts", Seq(1L, 2L).toDF("v"),
      Seq("v"), k = 64)
    val stale = cat.currentCommit
    SketchStats.appendWithStats(cat, "facts", Seq(3L).toDF("v"),
      Seq("v"), k = 64)
    intercept[graft.catalog.ConcurrentCommitException] {
      SketchStats.appendWithStats(cat, "facts", Seq(9L).toDF("v"),
        Seq("v"), k = 64, expected = Some(stale))
    }
    assert(cat.read(spark, "facts").count() == 3L)
    assert(cat.read(spark, SketchStats.statsTable("facts")).count() == 2L)
  }
}
