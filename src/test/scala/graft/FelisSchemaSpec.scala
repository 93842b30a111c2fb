package graft

import org.apache.spark.sql.types._

import graft.schema.{FelisSchema, PpdbSchema}

class FelisSchemaSpec extends SparkSpec {

  val yaml: String =
    """---
      |name: "ApdbSchema"
      |"@id": "#apdbSchema"
      |version: "0.1.1"
      |tables:
      |- name: metadata
      |  "@id": "#metadata"
      |  description: Table containing various metadata key/value pairs,
      |    folded over two lines.
      |  columns:
      |  - name: name
      |    "@id": "#metadata.name"
      |    datatype: text
      |    nullable: false
      |  - name: value
      |    "@id": "#metadata.value"
      |    datatype: text
      |    nullable: false
      |  primaryKey: "#metadata.name"
      |- name: DiaObject
      |  "@id": "#DiaObject"
      |  columns:
      |  - name: diaObjectId
      |    datatype: long
      |    nullable: false
      |    mysql:datatype: BIGINT
      |  - name: validityStartMjdTai
      |    datatype: double
      |    nullable: false
      |  - name: validityEndMjdTai
      |    datatype: double
      |    nullable: true
      |  - name: parallax
      |    datatype: float
      |  - name: nDiaSources
      |    datatype: int
      |    nullable: false
      |  primaryKey:
      |  - "#DiaObject.diaObjectId"
      |  - "#DiaObject.validityStartMjdTai"
      |  indexes:
      |  - name: IDX_DiaObject_validityStart
      |    columns:
      |    - "#DiaObject.validityStartMjdTai"
      |""".stripMargin

  test("parses tables, types, nullability, PKs, indexes") {
    val schema = FelisSchema.parse(yaml)
    assert(schema.name == "ApdbSchema" && schema.version == "0.1.1")
    assert(schema.tables.map(_.name) == Seq("metadata", "DiaObject"))

    val meta = schema.table("metadata")
    assert(meta.structType == StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("value", StringType, nullable = false))))
    assert(meta.primaryKey == Seq("name"))

    val obj = schema.table("DiaObject")
    assert(obj.structType.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq == Seq(
      ("diaObjectId", LongType, false),
      ("validityStartMjdTai", DoubleType, false),
      ("validityEndMjdTai", DoubleType, true),
      ("parallax", FloatType, true),
      ("nDiaSources", IntegerType, false)))
    assert(obj.primaryKey == Seq("diaObjectId", "validityStartMjdTai"))
    assert(obj.indexes == Seq(Seq("validityStartMjdTai")))
  }

  test("unknown felis type raises") {
    intercept[IllegalArgumentException] { FelisSchema.felisToSpark("decimal") }
  }

  test("mixed-case / quoted identifiers survive the schema + catalog " +
      "round trip") {
    // the reference exercises identifier quoting with mixed-case schema
    // names (tests/test_ppdb_sql.py:114-123); the Spark-side equivalents
    // are exact-case preservation through Felis parse -> registry ->
    // catalog parquet -> SQL over a mounted view, including a reserved
    // word ("Order") as a column name
    val quoted =
      """---
        |name: "Mixed_Case001"
        |version: "0.1.0"
        |tables:
        |- name: "MyTable_A"
        |  columns:
        |  - name: "RaDecErr"
        |    datatype: double
        |    nullable: false
        |  - name: "Order"
        |    datatype: long
        |    nullable: false
        |  - name: "lowercase"
        |    datatype: text
        |  primaryKey: "#MyTable_A.Order"
        |""".stripMargin
    val schema = FelisSchema.parse(quoted)
    assert(schema.name == "Mixed_Case001")
    val t = schema.table("MyTable_A")
    assert(t.structType.fields.map(_.name).toSeq ==
      Seq("RaDecErr", "Order", "lowercase"))
    assert(t.primaryKey == Seq("Order"))

    // registry: exact-case names in, exact-case out
    val root = tmpDir("mixed")
    val reg = new graft.catalog.SchemaRegistry(root)
    reg.put("MyTable_A", t.structType)
    assert(reg.tables.contains("MyTable_A"))
    assert(reg.get("MyTable_A").get._2.fields.map(_.name).toSeq ==
      Seq("RaDecErr", "Order", "lowercase"))

    // catalog: data committed under the mixed-case table keeps its
    // exact column case through the parquet round trip
    import spark.implicits._
    val cat = new graft.catalog.VersionedCatalog(root)
    val df = Seq((1.5, 10L, "x"), (2.5, 20L, "y"))
      .toDF("RaDecErr", "Order", "lowercase")
    cat.commit(Map("MyTable_A" -> df))
    val back = cat.read(spark, "MyTable_A")
    assert(back.schema.fields.map(_.name).toSeq ==
      Seq("RaDecErr", "Order", "lowercase"))

    // SQL over the mounted view: backtick-quoted reserved word resolves,
    // and (Spark's default case-insensitive resolution) unquoted
    // lower-case references still bind to the mixed-case columns
    graft.GraftSession.mount(spark, cat)
    val r = spark.sql(
      "SELECT `Order`, RaDecErr FROM MyTable_A ORDER BY `Order` DESC")
      .as[(Long, Double)].collect().toSeq
    assert(r == Seq((20L, 2.5), (10L, 1.5)))
    assert(spark.sql("SELECT radecerr FROM mytable_a WHERE `order` = 10")
      .head().getDouble(0) == 1.5)
  }

  test("parses the reference's real Felis schema file") {
    val path = "/root/reference/python/lsst/dax/ppdb/resources/config/" +
      "schemas/test_apdb_schema.yaml"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    val schema = FelisSchema.parse(yaml)
    assert(Set("metadata", "DiaObject", "DiaSource", "DiaForcedSource",
      "SSObject").subsetOf(schema.tables.map(_.name).toSet))
    assert(schema.table("DiaObject").structType == PpdbSchema.diaObject)
    assert(schema.table("DiaSource").structType == PpdbSchema.diaSource)
    assert(schema.table("DiaForcedSource").structType == PpdbSchema.diaForcedSource)
    assert(schema.table("DiaObject").primaryKey ==
      Seq("diaObjectId", "validityStartMjdTai"))
  }

  test("matches the hand-written PpdbSchema for shared columns") {
    val obj = FelisSchema.parse(yaml).table("DiaObject").structType
    obj.fields.foreach { f =>
      val ref = PpdbSchema.diaObject(f.name)
      assert(ref.dataType == f.dataType && ref.nullable == f.nullable, f.name)
    }
  }

  val legacyYaml: String =
    """---
      |name: "ApdbSchema"
      |version: "0.0.9"
      |tables:
      |- name: DiaObject
      |  columns:
      |  - name: diaObjectId
      |    datatype: long
      |    nullable: false
      |  - name: validityStart
      |    datatype: timestamp
      |    nullable: false
      |  - name: validityEnd
      |    datatype: timestamp
      |    nullable: true
      |""".stripMargin

  test("legacy validityStart-timestamp schema variant detected at load") {
    val legacy = FelisSchema.parse(legacyYaml)
    assert(!FelisSchema.usesMjdTai(legacy))
    assert(FelisSchema.validityColumns(legacy) ==
      ("validityStart", "validityEnd"))
    assert(legacy.table("DiaObject").structType("validityStart").dataType ==
      TimestampType)

    val modern = FelisSchema.parse(yaml)
    assert(FelisSchema.usesMjdTai(modern))
    assert(FelisSchema.validityColumns(modern) ==
      ("validityStartMjdTai", "validityEndMjdTai"))
  }

  test("legacy DiaObject converts to MJD TAI doubles on read") {
    import org.apache.spark.sql.Row
    import graft.functions.TaiTime
    val legacySchema = FelisSchema.parse(legacyYaml)
      .table("DiaObject").structType
    // 2022-01-01T00:00:00Z (TAI-UTC = 37 s) and an open interval
    val t0us = 1640995200000000L
    val rows = java.util.List.of(
      Row(1L, new java.sql.Timestamp(t0us / 1000L), null))
    val legacy = spark.createDataFrame(rows, legacySchema)
    val modern = graft.ops.PpdbOps.modernizeDiaObject(legacy)
    assert(modern.columns.toSeq ==
      Seq("diaObjectId", "validityStartMjdTai", "validityEndMjdTai"),
      "in-place rename preserves column order")
    val r = modern.collect().head
    assert(r.getDouble(1) == TaiTime.utcMicrosToMjdTai(t0us))
    assert(r.isNullAt(2), "open interval stays NULL")
    // idempotent on modern inputs
    assert(graft.ops.PpdbOps.modernizeDiaObject(modern).columns.toSeq ==
      modern.columns.toSeq)
  }
}
