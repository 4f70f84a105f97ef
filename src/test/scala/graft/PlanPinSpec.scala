package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r21 focused spec: the verify-width pins must SURVIVE optimization.
  * r20 shipped a repartition that Catalyst silently removed (the filter
  * pushed through it and EnsureRequirements elided the equal-count
  * shuffle) — the committed plans contradicted the claim and the fix
  * was a no-op. This guard reads the ACTUAL plan of each pinned
  * operator and asserts the user-specified pair-key exchange is still
  * there, so any future rewrite that re-enables elision fails loudly
  * instead of silently re-coalescing the verify stages. */
class PlanPinSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The pin: a REPARTITION_BY_NUM hash exchange on (id_a, id_b). */
  private def assertPinned(plan: String, what: String): Unit = {
    val pinned = plan.linesIterator.exists(l =>
      l.contains("REPARTITION_BY_NUM") && l.contains("hashpartitioning(id_a"))
    assert(pinned, s"$what lost its pinned (id_a, id_b) REPARTITION_BY_NUM exchange:\n$plan")
  }

  private lazy val docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog"),
    (2L, "en", "the quick brown fox jumps over the lazy dot"),
    (3L, "en", "a completely different sentence about engines"),
    (4L, "de", "der schnelle braune fuchs springt"),
    (5L, "de", "der schnelle braune fuchs sprinkt")
  ).toDF("doc_id", "lang", "text")

  test("editDistanceJoin keeps the pinned verify exchange") {
    val df = graft.ops.StringSim.editDistanceJoin(docs, "doc_id", "text",
      maxDist = 6, q = 2, blockOn = Seq("lang"), lengthBand = 6)
    assertPinned(planOf(df), "editDistanceJoin")
  }

  test("editDistanceLookup keeps the pinned verify exchange") {
    val df = graft.ops.StringSim.editDistanceLookup(
      docs.filter(col("doc_id") < 3), "doc_id", "text",
      docs, "doc_id", "text", maxDist = 6, q = 2)
    assertPinned(planOf(df), "editDistanceLookup")
  }

  test("containmentJoin keeps the pinned intersection exchange") {
    val df = graft.ops.StringSim.containmentJoin(docs, "doc_id", "text",
      n = 3, tauBp = 8000)
    assertPinned(planOf(df), "containmentJoin")
  }
}
