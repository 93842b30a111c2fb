package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** CDC / merge operator coverage for SURVEY.md §2: the pivot-style patch
  * build (A1), JSON field extraction (F1), field patch IF(present,new,old)
  * (F3), MERGE equi-joins on single and composite keys (J4/J5), computed
  * spatial-cell column on insert (J9/F4), composite record keys (F5), and
  * MJD time arithmetic (F6).
  *
  * The reference applies field-level update records (long-format CDC rows)
  * to target tables via GROUP-BY-pivot then MERGE
  * (P/bigquery/updates/updates_merger.py + merge_*.sql); here the `events`
  * table plays the role of the update-record stream (`props` is the JSON
  * payload) and TPC-H tables play the targets.
  */
object Cdc {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // F1: JSON_VALUE + CAST (ref: merge_diaobject_updates.sql:8-17)
    "f1_json_extract" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .select($"event_id",
          get_json_object($"props", "$.k").cast("long").as("k_val"))
        .where($"k_val".isNotNull)
    }),

    // A1: pivot-style patch build — GROUP BY key + ANY_VALUE(CASE WHEN
    // field='f' ...) + COUNTIF presence flag (ref: merge_diaobject_updates
    // .sql:3-25). max() replaces ANY_VALUE for determinism; presence flag
    // per event_type.
    "a1_patch_build" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .groupBy($"user_id")
        .agg(
          max(when($"event_type" === "purchase",
            get_json_object($"props", "$.k").cast("long"))).as("purchase_k"),
          (count(when($"event_type" === "purchase", lit(1))) > 0)
            .as("purchase_present"),
          max(when($"event_type" === "error",
            get_json_object($"props", "$.k").cast("long"))).as("error_k"),
          (count(when($"event_type" === "error", lit(1))) > 0)
            .as("error_present"))
    }),

    // J4 + F3: MERGE on single key — patch = latest 'purchase' event value
    // per user (last-write-wins), target = customer; update acctbal where a
    // patch exists (ref: merge_diaobject_updates.sql:28-32). Hand-rolled
    // MERGE: left-outer join + IF(present, new, old) rewrite.
    "j4_merge_single_key" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      val patch = events(s, d)
        .where($"event_type" === "purchase")
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"user_id", $"value".as("new_bal"))
      customer(s, d)
        .join(patch, $"c_custkey" === $"user_id", "left_outer")
        .select($"c_custkey", $"c_name",
          when($"user_id".isNotNull, $"new_bal").otherwise($"c_acctbal")
            .as("acctbal"))
    }),

    // J5: MERGE on composite key (ref: merge_diaforcedsource_updates.sql:
    // 23-28 — ON diaObjectId, visit, detector). Patch derived from the
    // discounted lineitems; key = (l_orderkey, l_linenumber).
    "j5_merge_composite_key" -> ((s, d) => {
      import s.implicits._
      val li = lineitem(s, d)
      val patch = li.where($"l_discount" > 0.05)
        .select($"l_orderkey".as("u_orderkey"), $"l_linenumber".as("u_linenumber"),
          ($"l_quantity" + 1.0).as("new_qty"))
      li.join(patch,
          $"l_orderkey" === $"u_orderkey" && $"l_linenumber" === $"u_linenumber",
          "left_outer")
        .select($"l_orderkey", $"l_linenumber",
          when($"u_orderkey".isNotNull, $"new_qty").otherwise($"l_quantity")
            .as("quantity"))
    }),

    // J6: validation anti-join — updates must hit existing target rows
    // (ref: P/sql/_ppdb_sql.py:303-314). Events whose user_id has no
    // customer row = dangling updates.
    "j6_dangling_updates" -> ((s, d) => {
      import s.implicits._
      events(s, d).select($"event_id", $"user_id")
        .join(customer(s, d).select($"c_custkey"),
          $"user_id" === $"c_custkey", "left_anti")
    }),

    // J9 + F4: staged insert with computed spatial-cell column
    // (ref: P/bigquery/chunk_promoter.py:205-227, ST_GEOGPOINT(ra,dec)).
    // Grid cell id from two continuous coords via exact integer arithmetic
    // (the library's hierarchical cell expression is spec-tested separately).
    "j9_cell_insert" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .where($"event_type" =!= "churn")
        .select($"event_id", $"user_id", $"value",
          (floor($"value" / 10.0).cast("long") * 4096L + $"user_id")
            .as("cell_id"))
    }),

    // F5: composite record key "-".join(ids)
    // (ref: P/bigquery/updates/expanded_updates_table.py:73-87)
    "f5_concat_key" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d)
        .where($"l_orderkey" < 200L)
        .select($"l_orderkey", $"l_linenumber",
          concat_ws("-", $"l_orderkey", $"l_linenumber", $"l_suppkey")
            .as("record_key"))
    }),

    // F6: MJD TAI time arithmetic — epoch micros → MJD double (pure
    // arithmetic, identical IEEE op sequence on both sides)
    // (ref: P/sql/_ppdb_sql.py:110-124,160-166)
    "f6_mjd_convert" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .select($"event_id",
          (unix_micros($"ts") / lit(86400000000.0) + lit(40587.0))
            .as("mjd_utc"))
    }),

    // F4 + S14 read path: Z-order spatial cell (custom codegen Expression)
    // + cone search with cell pruning and exact haversine predicate.
    // Synthetic sky positions derived from event columns.
    "f4_cone_search" -> ((s, d) => {
      import s.implicits._
      import graft.functions.SpatialCell
      val sky = events(s, d).select($"event_id",
        (($"value" * 7.0) % 360.0).as("ra"),
        (($"user_id" * 1.2345) % 180.0 - 90.0).as("dec"))
        .withColumn("cell_id", SpatialCell.spatialCell($"ra", $"dec", 12))
      SpatialCell.coneSearch(sky, "ra", "dec", "cell_id",
        centerRa = 180.0, centerDec = 0.0, radiusDeg = 30.0, level = 12)
        .select($"event_id", $"ra", $"dec", $"cell_id")
    })
  )

  /** DuckDB rendering of the Morton cell id at level 12 for coordinate
    * SQL exprs `ra`/`dec` — bit-for-bit the SpatialCellMath arithmetic.
    */
  private def sqlCell(ra: String, dec: String): String = {
    val x = s"CAST(floor((((($ra) % 360.0) + 360.0) % 360.0) / 360.0 * 4096) AS BIGINT)"
    val y = s"CAST(floor((($dec) + 90.0) / 180.0 * 4096) AS BIGINT)"
    s"""list_sum(list_transform(range(0, 12), b ->
       |   ((((least(4095, greatest(0, $x)) >> b) & 1) << (2*b)) +
       |    (((least(4095, greatest(0, $y)) >> b) & 1) << (2*b + 1)))))""".stripMargin
  }

  /** Haversine within-cone predicate matching SpatialCell.withinCone's
    * exact IEEE op sequence (center 180,0, radius 30deg).
    */
  private val sqlCone: String = {
    val d2r = "(pi() / 180.0)"
    s"""(asin(sqrt(
       |  sin((dec - 0.0) * $d2r / 2.0) * sin((dec - 0.0) * $d2r / 2.0) +
       |  cos(dec * $d2r) * cos(0.0 * $d2r) *
       |  sin((ra - 180.0) * $d2r / 2.0) * sin((ra - 180.0) * $d2r / 2.0)
       |)) * 2.0 / $d2r) <= 30.0""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "f1_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL""".stripMargin,
    "a1_patch_build" ->
      """SELECT user_id,
        |  max(CASE WHEN event_type = 'purchase'
        |      THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) AS purchase_k,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0 AS purchase_present,
        |  max(CASE WHEN event_type = 'error'
        |      THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) AS error_k,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) > 0 AS error_present
        |FROM events GROUP BY user_id""".stripMargin,
    "j4_merge_single_key" ->
      """WITH patch AS (
        |  SELECT user_id, value AS new_bal FROM (
        |    SELECT user_id, value,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1)
        |SELECT c_custkey, c_name,
        |       CASE WHEN patch.user_id IS NOT NULL THEN new_bal
        |            ELSE c_acctbal END AS acctbal
        |FROM customer LEFT JOIN patch ON c_custkey = patch.user_id""".stripMargin,
    "j5_merge_composite_key" ->
      """WITH patch AS (
        |  SELECT l_orderkey AS u_orderkey, l_linenumber AS u_linenumber,
        |         l_quantity + 1.0 AS new_qty
        |  FROM lineitem WHERE l_discount > 0.05)
        |SELECT l.l_orderkey, l.l_linenumber,
        |       CASE WHEN u_orderkey IS NOT NULL THEN new_qty
        |            ELSE l.l_quantity END AS quantity
        |FROM lineitem l LEFT JOIN patch
        |  ON l.l_orderkey = u_orderkey AND l.l_linenumber = u_linenumber""".stripMargin,
    "j6_dangling_updates" ->
      """SELECT event_id, user_id FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                  WHERE c.c_custkey = e.user_id)""".stripMargin,
    "j9_cell_insert" ->
      """SELECT event_id, user_id, value,
        |       CAST(floor(value / 10.0) AS BIGINT) * 4096 + user_id AS cell_id
        |FROM events WHERE event_type <> 'churn'""".stripMargin,
    "f5_concat_key" ->
      """SELECT l_orderkey, l_linenumber,
        |       concat_ws('-', l_orderkey, l_linenumber, l_suppkey) AS record_key
        |FROM lineitem WHERE l_orderkey < 200""".stripMargin,
    "f6_mjd_convert" ->
      """SELECT event_id, epoch_us(ts) / 86400000000.0 + 40587.0 AS mjd_utc
        |FROM events""".stripMargin,

    "f4_cone_search" ->
      s"""WITH sky AS (
         |  SELECT event_id,
         |         (value * CAST(7.0 AS DOUBLE)) % 360.0 AS ra,
         |         (user_id * CAST(1.2345 AS DOUBLE)) % 180.0 - 90.0 AS dec
         |  FROM events)
         |SELECT event_id, ra, dec,
         |       CAST(${sqlCell("ra", "dec")} AS BIGINT) AS cell_id
         |FROM sky WHERE $sqlCone""".stripMargin
  )
}
