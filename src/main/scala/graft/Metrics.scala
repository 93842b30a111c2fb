package graft

import scala.collection.mutable

/** Named-timer instrumentation reproducing the reference's metric surface
  * (BASELINE.md §1: replicate_chunk_time, get_chunks_time,
  * store_chunks_time, store_data_time, update_validity_time,
  * write_parquet_time, upload_files_time, …). Timers log one line per
  * observation with tags and accumulate for end-of-run summaries.
  */
object Metrics {

  final case class Sample(metric: String, seconds: Double,
      tags: Map[String, String])

  private val samples = mutable.ArrayBuffer.empty[Sample]
  @volatile var logEnabled: Boolean = false

  def time[A](metric: String, tags: (String, String)*)(body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally record(metric, (System.nanoTime() - t0) / 1e9, tags.toMap)
  }

  def record(metric: String, seconds: Double,
      tags: Map[String, String] = Map.empty): Unit = synchronized {
    samples += Sample(metric, seconds, tags)
    if (logEnabled) {
      val tagStr = if (tags.isEmpty) ""
        else tags.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
          .mkString(" [", ",", "]")
      System.err.println(f"[metric] $metric$tagStr ${seconds}%.3f s")
    }
  }

  def snapshot(): Seq[Sample] = synchronized(samples.toSeq)

  def summary(): Map[String, (Int, Double)] = synchronized {
    samples.groupBy(_.metric).view
      .mapValues(ss => (ss.size, ss.map(_.seconds).sum)).toMap
  }

  def reset(): Unit = synchronized(samples.clear())
}
