package graft

/** Structural integrity of the SparkEntry query registry. Scala's
  * `Map(...)` varargs silently keep the LAST entry on a duplicate key —
  * round 12 caught a graph-tier query named `q_sample_weighted`
  * silently REPLACING the sampling-tier query of the same name (both
  * verified green, but the original stopped being checked at all).
  * This spec pins the registry against that failure mode by parsing
  * the source literal: every `"q_*" ->` arrow must be unique, and the
  * runtime Maps must hold exactly the keys the source declares. */
class EntryIntegritySpec extends GraftSuite {

  private lazy val src = {
    val p = java.nio.file.Paths.get(
      "src/main/scala/graft/SparkEntry.scala")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("queries: no duplicate keys in the source literal; runtime Map " +
      "holds exactly the declared keys") {
    val body = src.substring(0, src.indexOf("def oracleSql"))
    val arrows = """"((?:q|x)_[a-z0-9_]+)"\s*->\s*\(\(s, dir\)""".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
    val dupes = arrows.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query entries: ${dupes.mkString(", ")}")
    assert(SparkEntry.queries.keySet == arrows.toSet,
      s"source/runtime drift: missing=${arrows.toSet -- SparkEntry.queries.keySet} " +
        s"extra=${SparkEntry.queries.keySet -- arrows.toSet}")
  }

  test("oracleSql: no duplicate keys; every oracle names a real query") {
    val body = src.substring(src.indexOf("def oracleSql"))
    val arrows = """"((?:q|x)_[a-z0-9_]+)"\s*->""".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
    val dupes = arrows.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate oracle entries: ${dupes.mkString(", ")}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "oracles without a query: " +
        (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.keySet == arrows.toSet)
  }
}
