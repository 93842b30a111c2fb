package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand-rolled fallback for cases AQE's
  * runtime skew-join splitting doesn't reach (e.g. aggregations over a
  * dominant key, or storage layouts fixed before runtime).
  *
  * Salt assignment is hash-derived (no rand()); the salt column never
  * reaches the result, so outputs are exactly those of the unsalted
  * operator regardless of how rows land in salt buckets.
  */
object Skew {

  /** Two-phase aggregation over a skewed group key: pre-aggregate on
    * (key, salt) — spreading each hot key over `salts` reducers — then
    * finish on key. `aggs` must be algebraic (sum/count/min/max style)
    * with matching (partial, merge) column pairs.
    *
    * Example: saltedCount(df, "k", 16) == df.groupBy("k").count()
    * with the hot key's work spread 16 ways.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("count"))

  /** Skew-safe equi-join: salt the (large, skewed) left side
    * deterministically into `salts` buckets and replicate the right side
    * once per bucket, so a hot key's rows land on `salts` tasks instead
    * of one. Results equal `left.join(right, key)` exactly.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val explodedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(explodedRight, Seq(key, "_salt")).drop("_salt")
  }
}
