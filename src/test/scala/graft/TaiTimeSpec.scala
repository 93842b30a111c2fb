package graft

import org.apache.spark.sql.functions._

import graft.functions.TaiTime

class TaiTimeSpec extends SparkSpec {
  import spark.implicits._

  test("TAI-UTC offsets at known epochs") {
    // 2022-01-01 UTC -> 37 s (current era)
    assert(TaiTime.taiMinusUtcAt(1640995200L) == 37)
    // 2016-12-31 -> 36 s (before the 2017 leap second)
    assert(TaiTime.taiMinusUtcAt(1483228799L) == 36)
    // mid-1972
    assert(TaiTime.taiMinusUtcAt(63072000L) == 10)
  }

  test("MJD TAI round-trip through the stored-as-UTC convention") {
    val us = 1640995200000000L // 2022-01-01 UTC in micros
    val mjdTai = TaiTime.utcMicrosToMjdTai(us)
    // 2022-01-01 UTC = MJD 59580 UTC; TAI is 37 s ahead
    assert(math.abs(TaiTime.utcMicrosToMjdUtc(us) - 59580.0) < 1e-9)
    assert(math.abs(mjdTai - (59580.0 + 37.0 / 86400.0)) < 1e-9)
    assert(TaiTime.mjdTaiToUtcMicros(mjdTai) == us)
  }

  test("column form agrees with scalar form across leap-second boundaries") {
    val samples = Seq(63072000000000L, 1483228799000000L, 1483228800000000L,
      1640995200000000L, 915148800000000L)
    val got = samples.toDF("us")
      .select(TaiTime.mjdTai($"us").as("mjd"), TaiTime.mjdUtc($"us").as("mjdu"))
      .collect()
    samples.zip(got).foreach { case (us, r) =>
      assert(r.getDouble(0) == TaiTime.utcMicrosToMjdTai(us))
      assert(r.getDouble(1) == TaiTime.utcMicrosToMjdUtc(us))
    }
  }
}
