package graft

import graft.catalog.{MetadataTable, VersionedCatalog}
import graft.replicate.PpdbSpark
import graft.schema.{PpdbSchema, VersionTuple}

/** Persisted metadata table: reference `metadata` KV table semantics
  * (P/sql/_ppdb_sql_base.py:151-154,263-372) — round-trip across a
  * catalog reopen, set/force/delete behavior, and version-compatibility
  * checks on reopening an existing store.
  */
class MetadataSpec extends SparkSpec {

  test("set/get/delete with reference set-semantics (no silent overwrite)") {
    val meta = new MetadataTable(spark, new VersionedCatalog(tmpDir("meta")))
    meta.init()
    assert(meta.items.isEmpty)
    meta.set("k1", "v1")
    assert(meta.get("k1").contains("v1"))
    intercept[IllegalStateException] { meta.set("k1", "v2") }
    meta.set("k1", "v2", force = true)
    assert(meta.get("k1").contains("v2"))
    assert(meta.delete("k1"))
    assert(!meta.delete("k1"))
    assert(meta.get("k1").isEmpty)
  }

  test("metadata round-trips across a catalog reopen; versions persisted") {
    val root = tmpDir("metappdb")
    val ppdb = new PpdbSpark(spark, new VersionedCatalog(root))
    ppdb.init()
    ppdb.meta.set("custom:key", "custom-value")

    // fresh catalog + store over the same root = reopen
    val reopened = new PpdbSpark(spark, new VersionedCatalog(root))
    reopened.init() // idempotent: checks versions instead of re-creating
    assert(reopened.metadata("custom:key") == "custom-value")
    assert(reopened.metadata(MetadataTable.SchemaVersionKey)
      == PpdbSchema.schemaVersion.render)
    assert(reopened.metadata(MetadataTable.CodeVersionKey)
      == VersionTuple.Current.render)
  }

  test("incompatible stored versions refuse to open") {
    val root = tmpDir("metappdb")
    val ppdb = new PpdbSpark(spark, new VersionedCatalog(root))
    ppdb.init()
    // stored by a future major of the schema line
    ppdb.meta.set(MetadataTable.SchemaVersionKey, "99.0.0", force = true)
    val reopened = new PpdbSpark(spark, new VersionedCatalog(root))
    intercept[IllegalStateException] { reopened.init() }
    // restoring a compatible version opens again (patch differences OK)
    ppdb.meta.set(MetadataTable.SchemaVersionKey,
      VersionTuple(PpdbSchema.schemaVersion.major,
        PpdbSchema.schemaVersion.minor, 9).render, force = true)
    reopened.init()
  }
}
