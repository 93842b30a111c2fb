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
}
