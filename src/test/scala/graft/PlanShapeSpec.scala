package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guards on the physical-plan properties PLANS.md claims
  * for the round-3 operators — the scale-relevant shape, not timings. */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dd07: banded candidates, never a cartesian corpus square") {
    val p = plan("dd07_embedding_neardup")
    assert(!p.contains("CartesianProduct"), "dd07 must not plan all-pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "dd07 must join on band keys")
  }

  test("sp01: running sum plans no window operator") {
    val p = plan("sp01_token_budget")
    assert(!p.contains("Window"),
      "GlobalCumsum must not fall back to a (single-partition) window")
  }

  test("sp02: scan never reads the text column") {
    val p = plan("sp02_stratified_sample")
    assert(p.contains("ReadSchema") && !p.contains("text:string"),
      "stratified sample must prune to doc_id/lang")
  }

  test("dd09: eval gram set broadcasts (no corpus shuffle on gram)") {
    val p = plan("dd09_benchmark_decontamination")
    assert(p.contains("BroadcastHashJoin"), "eval side must broadcast")
  }

  test("q61: props parse once via variant, not per-field JSON re-parse") {
    val p = plan("q61_variant_json")
    assert(p.contains("parse_json") || p.contains("variant"),
      "q61 must go through VariantType")
  }
}
