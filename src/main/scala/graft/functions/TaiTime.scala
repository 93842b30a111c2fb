package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TAI ↔ UTC ↔ MJD time handling, isolated in one module (the reference's
  * subtle convention: science times are double MJD **TAI**; bookkeeping
  * timestamps are TAI seconds *stored in UTC-labeled columns* and
  * reinterpreted on read — P/sql/_ppdb_sql.py:110-124,160-166,
  * _ppdb_sql_base.py:552-562).
  *
  * Leap-second table: cumulative TAI-UTC offsets since 1972 (public IERS
  * data). TAI-UTC has been 37 s since 2017-01-01 and no leap second has
  * been scheduled since, so the last entry covers all current data.
  */
object TaiTime {

  /** (UTC epoch seconds when the offset took effect, TAI-UTC seconds). */
  val leapSeconds: Seq[(Long, Int)] = Seq(
    63072000L -> 10, 78796800L -> 11, 94694400L -> 12, 126230400L -> 13,
    157766400L -> 14, 189302400L -> 15, 220924800L -> 16, 252460800L -> 17,
    283996800L -> 18, 315532800L -> 19, 362793600L -> 20, 394329600L -> 21,
    425865600L -> 22, 489024000L -> 23, 567993600L -> 24, 631152000L -> 25,
    662688000L -> 26, 709948800L -> 27, 741484800L -> 28, 773020800L -> 29,
    820454400L -> 30, 867715200L -> 31, 915148800L -> 32, 1136073600L -> 33,
    1230768000L -> 34, 1341100800L -> 35, 1435708800L -> 36, 1483228800L -> 37)

  /** Days between MJD epoch (1858-11-17) and Unix epoch (1970-01-01). */
  val MjdUnixEpoch = 40587.0
  val UsPerDay = 86400000000.0

  def taiMinusUtcAt(utcEpochSec: Long): Int =
    leapSeconds.reverseIterator.find(_._1 <= utcEpochSec).map(_._2).getOrElse(10)

  // ------------------------------------------------------------ scalar form

  def utcMicrosToMjdUtc(us: Long): Double = us / UsPerDay + MjdUnixEpoch

  def utcMicrosToMjdTai(us: Long): Double =
    (us + taiMinusUtcAt(us / 1000000L) * 1000000L) / UsPerDay + MjdUnixEpoch

  def mjdTaiToUtcMicros(mjdTai: Double): Long = {
    val taiUs = ((mjdTai - MjdUnixEpoch) * UsPerDay).round
    // offset is a step function of UTC; one fixed-point pass suffices
    // because offsets change by 1 s and steps are years apart
    val guess = taiUs - taiMinusUtcAt(taiUs / 1000000L) * 1000000L
    taiUs - taiMinusUtcAt(guess / 1000000L) * 1000000L
  }

  // ------------------------------------------------------------ column form

  /** MJD UTC from an epoch-micros column (pure arithmetic). */
  def mjdUtc(us: Column): Column = us / lit(UsPerDay) + lit(MjdUnixEpoch)

  /** MJD TAI from an epoch-micros column: arithmetic + the leap-second
    * step function folded into a CASE chain (codegen'd, no UDF).
    */
  def mjdTai(us: Column): Column = {
    val offsetSec = leapSeconds.foldLeft(lit(10): Column) {
      case (acc, (start, off)) =>
        when(us >= start * 1000000L, lit(off)).otherwise(acc)
    }
    (us + offsetSec * 1000000L) / lit(UsPerDay) + lit(MjdUnixEpoch)
  }

  /** The reference's bookkeeping convention: TAI seconds stored in a
    * UTC-labeled timestamp column. Writing: shift UTC micros forward by
    * TAI-UTC; reading reverses it.
    */
  def utcToStoredTai(us: Column): Column = {
    val offsetSec = leapSeconds.foldLeft(lit(10): Column) {
      case (acc, (start, off)) =>
        when(us >= start * 1000000L, lit(off)).otherwise(acc)
    }
    us + offsetSec * 1000000L
  }
}
