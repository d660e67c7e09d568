package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: no module silently shadows another's
  * query, every oracle key has a query, and the flagship entry is
  * registered. */
class SparkEntrySpec extends AnyFunSuite {

  private val modules = Seq(
    "Relational" -> graft.queries.Relational.queries.keySet,
    "Relational2" -> graft.queries.Relational2.queries.keySet,
    "Relational3" -> graft.queries.Relational3.queries.keySet,
    "Relational4" -> graft.queries.Relational4.queries.keySet,
    "Relational5" -> graft.queries.Relational5.queries.keySet,
    "Events" -> graft.queries.Events.queries.keySet,
    "CdcTypes" -> graft.queries.CdcTypes.queries.keySet,
    "CdcPipeline" -> graft.queries.CdcPipeline.queries.keySet,
    "Text" -> graft.queries.Text.queries.keySet,
    "Dedup" -> graft.queries.DedupQueries.queries.keySet,
    "Similarity" -> graft.queries.SimilarityQueries.queries.keySet,
    "Multimodal" -> graft.queries.MultimodalQueries.queries.keySet,
    "Pipeline" -> graft.queries.Pipeline.queries.keySet)

  test("no query-name collisions across modules") {
    val all = modules.flatMap(_._2)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"colliding query names: $dupes")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle entry has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query is oracled: no rows-only entries remain") {
    // round 9 moved every hash/quantizer/sketch-defined entry to a
    // driver-checkable measurement gate (recall, exactness, error
    // bound, or structural invariant — each with a VALUES oracle);
    // round 10 closed the last gap by making m03 a REAL in-sandbox
    // decode (binary PPM) whose features DuckDB recomputes bytewise
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set.empty[String], rowsOnly)
  }
}
