package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory invariants the driver contract relies on: unique names (a
  * duplicate silently shadows a query in the `byName`/`queries` maps),
  * an oracle for EVERY query (the engine's standard — no rows-only
  * checks), and an exact count tripwire so an accidental drop during a
  * refactor fails loudly instead of shrinking coverage silently. When a
  * query is added on purpose, bump the count here alongside the doc sync
  * (COVERAGE.md / README.md / verify SKILL.md).
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique — nothing shadowed in the driver maps") {
    val names = QueryRegistry.all.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every query carries a DuckDB oracle (no rows-only fallbacks)") {
    val missing = QueryRegistry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without an oracle: ${missing.mkString(", ")}")
  }

  test("inventory count tripwire") {
    assert(QueryRegistry.all.size == 384,
      s"expected 384 queries, found ${QueryRegistry.all.size} — if you added " +
        "one on purpose, bump this count and sync COVERAGE.md/README.md")
  }
}
