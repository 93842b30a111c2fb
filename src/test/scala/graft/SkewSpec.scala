package graft

import org.apache.spark.sql.functions._

import graft.catalog.VersionedCatalog
import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count equals plain groupBy count under heavy skew") {
    // 90% of rows share one key
    val df = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(lit(999L)).as("k"))
    val plain = df.groupBy("k").count()
    val salted = Skew.saltedCount(df, "k", salts = 16)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted join equals plain join under heavy skew") {
    val left = spark.range(5000)
      .select(when($"id" % 100 === 0, $"id").otherwise(lit(42L)).as("k"),
        $"id".as("v"))
    val right = Seq((42L, "hot"), (100L, "cold"), (0L, "zero"))
      .toDF("k", "label")
    val plain = left.join(right, Seq("k"))
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("ppdb write options produce readable blooms-enabled parquet") {
    val cat = new VersionedCatalog(tmpDir("bloom"),
      VersionedCatalog.ppdbWriteOptions)
    val df = Seq((1L, 60000.0, Option.empty[Double]))
      .toDF("diaObjectId", "validityStartMjdTai", "validityEndMjdTai")
    cat.commit(Map("internal.DiaObject" -> df))
    assert(cat.read(spark, "internal.DiaObject").count() == 1)
  }
}
