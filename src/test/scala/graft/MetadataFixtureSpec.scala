package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{IndexDef, IndexMetadata}

/** Pins the metadata.json wire format against COMMITTED fixtures
  * (`src/test/resources/index_metadata/`), the reference's
  * IndexMetadataTests / v1.json…v9.json pattern: every historical shape a
  * persisted store may carry must keep parsing, and the CURRENT
  * serialization must not drift byte-wise without a deliberate fixture
  * update in the same commit.
  *
  * No Spark needed — metadata is pure JSON. */
class MetadataFixtureSpec extends AnyFunSuite {

  private def fixture(name: String): String =
    new String(Files.readAllBytes(
      Paths.get("src/test/resources/index_metadata", name)), StandardCharsets.UTF_8)

  test("current_pinned.json: today's writePretty output, byte-stable round-trip") {
    val committed = fixture("current_pinned.json")
    // parse → re-serialize must reproduce the committed bytes exactly: any
    // field rename, reorder, or format change in IndexMetadata.toJson fails
    // here and needs a fixture regeneration + metadataVersion decision
    assert(IndexMetadata.toJson(IndexMetadata.fromJson(committed)) == committed.trim,
      "serialization format drifted from the committed pin")
    val m = IndexMetadata.fromJson(committed)
    assert(m.storageVersion == 2 && m.metadataVersion == 1)
    assert(m.indexes.map(_.indexType).toSet ==
      Set("regular", "temporal", "bloom", "range"))
  }

  test("v1_minimal.json: absent optional fields default (additive versioning)") {
    val m = IndexMetadata.fromJson(fixture("v1_minimal.json"))
    assert(m.name == "legacy_minimal")
    assert(m.readOptions.isEmpty)
    assert(m.metadataVersion == 1 && m.storageVersion == 1)
    assert(m.consolidationsSinceCompact == 0)
    assert(m.indexes == List(IndexDef("k", "regular")))
    assert(m.schema.fieldNames.toSeq == Seq("k"))
  }

  test("v1_full.json: every index kind with its optional fields parses") {
    val m = IndexMetadata.fromJson(fixture("v1_full.json"))
    assert(m.format == "csv")
    assert(m.readOptions == Map("header" -> "true", "delimiter" -> "|"))
    assert(m.consolidationsSinceCompact == 3)
    assert(m.indexFor("k").contains(IndexDef("k", "regular")))
    assert(m.indexFor("k_mod").contains(
      IndexDef("k_mod", "computed", expr = Some("pmod(k, 8)"))))
    assert(m.indexFor("tag").contains(
      IndexDef("tag", "exploded", expr = Some("tags"))))
    assert(m.indexFor("typ").contains(
      IndexDef("typ", "bloom", fpr = Some(0.05))))
    assert(m.indexFor("ts").contains(IndexDef("ts", "range")))
    assert(m.indexFor("u").contains(
      IndexDef("u", "temporal", tsColumn = Some("ts"))))
    // storage-column mapping is part of the persisted contract
    assert(m.indexFor("typ").get.storageColumn == "bloom_typ")
    assert(m.indexFor("ts").get.storageColumn == "range_ts")
    assert(m.indexFor("u").get.storageColumn == "u")
  }

  test("future_unknown_fields.json: unknown fields tolerated, known preserved") {
    val m = IndexMetadata.fromJson(fixture("future_unknown_fields.json"))
    assert(m.metadataVersion == 99 && m.storageVersion == 2)
    assert(m.indexes == List(IndexDef("k", "regular")),
      "unknown per-index fields must not break parsing")
  }

  test("round-trip stability: parse(serialize(parse(x))) == parse(x) for all fixtures") {
    Seq("current_pinned.json", "v1_minimal.json", "v1_full.json",
      "future_unknown_fields.json").foreach { f =>
      val once = IndexMetadata.fromJson(fixture(f))
      val twice = IndexMetadata.fromJson(IndexMetadata.toJson(once))
      assert(once == twice, s"$f not round-trip stable")
    }
  }
}
