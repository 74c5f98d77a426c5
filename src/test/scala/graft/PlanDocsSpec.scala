package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Plan-audit coverage guard (VERDICT r10 #4): every query name in the
  * `SparkEntry` registry must appear in the plan-audit docs
  * (PLANS.md's per-query index or EXPLAINS.md), so a reviewer can grep
  * any registry name and find its plan rationale. A query added
  * without a doc row fails here by name instead of silently drifting
  * out of the audit.
  */
class PlanDocsSpec extends AnyFunSuite {

  test("every SparkEntry query name appears in PLANS.md or EXPLAINS.md") {
    val docs = Seq("PLANS.md", "EXPLAINS.md")
      .map(p => Files.readString(Paths.get(p))).mkString("\n")
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(docs.contains)
    assert(missing.isEmpty,
      s"queries with no plan-doc entry: ${missing.mkString(", ")} — " +
        "add a row to PLANS.md's per-query index")
  }

  test("every oracle key has a registered query and vice versa") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty,
      s"oracle entries with no query: ${(os -- qs).toSeq.sorted.mkString(", ")}")
    assert((qs -- os).isEmpty,
      s"queries with no oracle (driver would record a weaker rows-only " +
        s"check): ${(qs -- os).toSeq.sorted.mkString(", ")}")
  }
}
