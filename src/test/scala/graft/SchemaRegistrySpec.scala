package graft

import graft.catalog.SchemaRegistry
import graft.schema.{PpdbSchema, VersionTuple}

class SchemaRegistrySpec extends SparkSpec {

  test("round-trips StructType + version") {
    val reg = new SchemaRegistry(tmpDir("reg"))
    reg.put("DiaObject", PpdbSchema.diaObject, VersionTuple(0, 1, 0))
    val (v, schema) = reg.get("DiaObject").get
    assert(v == VersionTuple(0, 1, 0))
    assert(schema == PpdbSchema.diaObject)
    assert(reg.tables == Seq("DiaObject"))
  }

  test("slash and underscore table names never collide; names decode") {
    import org.apache.spark.sql.types._
    val reg = new graft.catalog.SchemaRegistry(tmpDir("reg-inj"))
    val s1 = StructType(Seq(StructField("a", LongType)))
    val s2 = StructType(Seq(StructField("b", StringType)))
    reg.put("staging/DiaSource", s1)
    reg.put("staging_DiaSource", s2)
    assert(reg.get("staging/DiaSource").get._2 == s1)
    assert(reg.get("staging_DiaSource").get._2 == s2)
    assert(reg.tables.toSet == Set("staging/DiaSource", "staging_DiaSource"))
  }

  test("version compatibility rule (major match, code minor >= stored)") {
    assert(VersionTuple(1, 2, 0).compatibleWith(VersionTuple(1, 2, 5)))
    assert(VersionTuple(1, 3, 0).compatibleWith(VersionTuple(1, 2, 0)))
    assert(!VersionTuple(1, 1, 0).compatibleWith(VersionTuple(1, 2, 0)))
    assert(!VersionTuple(2, 0, 0).compatibleWith(VersionTuple(1, 9, 0)))
  }

  test("check throws precisely on incompatibility and missing schema") {
    val reg = new SchemaRegistry(tmpDir("reg"))
    reg.put("T", PpdbSchema.metadata, VersionTuple(2, 4, 0))
    assert(reg.check("T", VersionTuple(2, 5, 0)) == PpdbSchema.metadata)
    val e = intercept[IllegalStateException] {
      reg.check("T", VersionTuple(2, 3, 0))
    }
    assert(e.getMessage.contains("stored 2.4.0"))
    intercept[IllegalStateException] { reg.check("missing") }
  }
}
