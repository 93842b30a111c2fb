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

  test("legacy-escaped schema files resolve and migrate on read") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val root = tmpDir("reg-legacy")
    val reg = new SchemaRegistry(root)
    // simulate a catalog written by an earlier build whose escape was
    // '/'→'_' with no '_' doubling: table `docs_minhash.banded` landed at
    // docs_minhash.banded.json (new scheme expects docs__minhash.banded)
    val json = s"""{"version":"0.1.0","schema":${PpdbSchema.metadata.json}}"""
    Files.write(Paths.get(root, "_schemas", "docs_minhash.banded.json"),
      json.getBytes(StandardCharsets.UTF_8))
    val got = reg.get("docs_minhash.banded")
    assert(got.exists(_._2 == PpdbSchema.metadata),
      "legacy file resolves on read")
    // and the file migrated to the injective name, so listing decodes
    assert(Files.exists(
      Paths.get(root, "_schemas", "docs__minhash.banded.json")))
    assert(!Files.exists(
      Paths.get(root, "_schemas", "docs_minhash.banded.json")))
    assert(reg.tables == Seq("docs_minhash.banded"))
    // put over a legacy twin retires it (no double listing)
    Files.write(Paths.get(root, "_schemas", "a_b.json"),
      json.getBytes(StandardCharsets.UTF_8))
    reg.put("a_b", PpdbSchema.metadata)
    assert(reg.tables == Seq("a_b", "docs_minhash.banded"))
  }

  test("legacy files with a recorded owner cannot be cross-claimed") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val root = tmpDir("reg-own")
    val reg = new SchemaRegistry(root)
    // a NEW-format file (records its owner "a/b") parked at the legacy
    // filename both "a/b" and "a_b" map to under the old scheme
    val owned = s"""{"table":"a/b","version":"0.1.0",""" +
      s""""schema":${PpdbSchema.metadata.json}}"""
    Files.write(Paths.get(root, "_schemas", "a_b.json"),
      owned.getBytes(StandardCharsets.UTF_8))
    // the never-declared twin must neither resolve nor consume the file
    assert(reg.get("a_b").isEmpty, "a_b must not hijack a/b's schema")
    assert(Files.exists(Paths.get(root, "_schemas", "a_b.json")),
      "refused claim must not migrate the file away")
    // the recorded owner still resolves (and migrates to the injective
    // name), after which the twin remains unresolvable
    assert(reg.get("a/b").exists(_._2 == PpdbSchema.metadata))
    assert(Files.exists(Paths.get(root, "_schemas", "a_1b.json")))
    assert(reg.get("a_b").isEmpty)
    // remove("a_b") must not delete what is now only a/b's state
    reg.remove("a_b")
    assert(reg.get("a/b").nonEmpty)

    // an UNOWNED (pre-recording) ambiguous file belongs to the identity
    // preimage: the slash claimant is refused, the literal name wins
    val unowned = s"""{"version":"0.1.0","schema":${PpdbSchema.metadata.json}}"""
    Files.write(Paths.get(root, "_schemas", "x_y.json"),
      unowned.getBytes(StandardCharsets.UTF_8))
    assert(reg.get("x/y").isEmpty, "slash claim on unowned file refused")
    assert(reg.get("x_y").exists(_._2 == PpdbSchema.metadata))
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
