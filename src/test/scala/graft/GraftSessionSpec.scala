package graft

import graft.catalog.VersionedCatalog
import graft.functions.SpatialCellMath

class GraftSessionSpec extends SparkSpec {
  import spark.implicits._

  test("catalog tables are queryable through spark.sql") {
    val cat = new VersionedCatalog(tmpDir("sess"))
    cat.commit(Map(
      "internal.DiaObject" -> Seq((1L, 45.0, -30.0), (2L, 200.0, 10.0))
        .toDF("diaObjectId", "ra", "dec")))
    val got = GraftSession.sql(spark, cat,
      "SELECT diaObjectId FROM internal_DiaObject WHERE ra > 100 ORDER BY 1")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
  }

  test("spatial_cell and vec_dot are callable from SQL") {
    GraftSession.registerFunctions(spark)
    val cell = spark.sql("SELECT spatial_cell(45.0D, -30.0D, 12)")
      .head().getLong(0)
    assert(cell == SpatialCellMath.cell(45.0, -30.0, 12))
    val cellDefault = spark.sql("SELECT spatial_cell(45.0D, -30.0D)")
      .head().getLong(0)
    assert(cellDefault == cell)
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0)
    assert(dot == 11.0)
  }

  test("text-pipeline functions are callable from SQL") {
    GraftSession.registerFunctions(spark)
    val fp = spark.sql("SELECT char_hash('abc')").head().getLong(0)
    assert(fp == graft.functions.TextHashing.charHash("abc"))
    val sh = spark.sql("SELECT simhash('the quick brown fox')")
      .head().getLong(0)
    assert(sh == graft.functions.TextHashing.simhash("the quick brown fox"))
    val shingles = spark.sql("SELECT shingle_hashes('a b c d', 3)")
      .head().getSeq[Long](0)
    assert(shingles ==
      graft.functions.TextHashing.shingleHashes("a b c d", 3).toSeq)
    val sig = spark.sql("SELECT minhash_sig(shingle_hashes('a b c d', 3), 4)")
      .head().getSeq[Long](0)
    assert(sig.length == 4)
    val st = spark.sql("SELECT text_stats('the cat sat').n_tokens")
      .head().getInt(0)
    assert(st == 3)
    val rep = spark.sql("SELECT repetition_stats('a b a b', 2)").head()
      .getStruct(0)
    assert(rep.getLong(0) == 3L && rep.getLong(1) == 2L &&
      rep.getLong(2) == 2L)
    val wf = spark.sql("SELECT winnow_fingerprints('abcdefghij', 4, 3)")
      .head().getSeq[Long](0)
    assert(wf == graft.functions.TextHashing.winnow("abcdefghij", 4, 3).toSeq)
    val wp = spark.sql(
      "SELECT winnow_positions('abcdefghij', 4, 3)[0].pos").head().getLong(0)
    assert(wp ==
      graft.functions.TextHashing.winnowPos("abcdefghij", 4, 3).head._2)
    val hh = spark.sql(
      "SELECT space_saving_topk(v, 8, 2) FROM VALUES (1L),(1L),(2L) AS t(v)")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(hh.map(r => (r.getLong(0), r.getLong(1))) == Seq(1L -> 2L, 2L -> 1L))
    val kq = spark.sql(
      "SELECT kll_quantiles(v, 16, 0.5, 0.95) FROM VALUES " +
        "(1L),(2L),(3L),(4L) AS t(v)").head().getStruct(0)
    assert(kq.getSeq[Long](0) == Seq(2L, 4L)) // ranks ceil(.5*4), ceil(.95*4)
    assert(kq.getLong(1) == 0L && kq.getLong(2) == 4L)
    // summary-table pairs compose in pure SQL: sketch per group, merge
    val km = spark.sql(
      "SELECT kll_merge(sk, 16, 0.5) FROM (SELECT kll_sketch(v, 16) AS sk " +
        "FROM VALUES (1L,1),(2L,1),(3L,2),(4L,2) AS t(v, g) GROUP BY g)")
      .head().getStruct(0)
    assert(km.getSeq[Long](0) == Seq(2L) && km.getLong(2) == 4L)
    val cm = spark.sql(
      "SELECT cm_merge(sk, 2, 64, 8, 1) FROM (SELECT " +
        "cm_sketch(v, 2, 64, 8) AS sk FROM VALUES (7L,1),(7L,1),(9L,2) " +
        "AS t(v, g) GROUP BY g)")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(cm.map(r => (r.getLong(0), r.getLong(1))) == Seq(7L -> 2L))
    val hll = spark.sql(
      "SELECT hll_merge(r, 12).n_distinct FROM (SELECT hll_sketch(v, 12) " +
        "AS r FROM VALUES (1L,1),(2L,1),(2L,2),(3L,2) AS t(v, g) GROUP BY g)")
      .head().getLong(0)
    assert(hll == 3L) // linear-counting regime: exact at tiny cardinality
    val cdc = spark.sql("SELECT cdc_chunks('short text', 16, 64)")
      .head().getSeq[String](0)
    assert(cdc == Seq("short text"))
    val bh = spark.sql(
      "SELECT blocklist_hits('ushers', 'he', 'she', 'his', 'hers')")
      .head().getSeq[Long](0)
    assert(bh == Seq(1L, 1L, 0L, 1L))
    val bs = spark.sql("SELECT blocklist_scrub('she sells', 'she', 'ell')")
      .head().getString(0)
    assert(bs == " ss")
  }

  test("views track the snapshot the mount saw; remount advances") {
    val cat = new VersionedCatalog(tmpDir("sess"))
    cat.commit(Map("t" -> Seq(1).toDF("x")))
    GraftSession.mount(spark, cat)
    assert(spark.sql("SELECT count(*) FROM t").head().getLong(0) == 1L)
    cat.commit(Map("t" -> Seq(1, 2).toDF("x")))
    GraftSession.mount(spark, cat)
    assert(spark.sql("SELECT count(*) FROM t").head().getLong(0) == 2L)
  }
}
