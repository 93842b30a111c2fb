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
