package graft.tools

/** Audit: which keys plan a `BroadcastNestedLoopJoin`? Each hit must
  * be a bounded broadcast (scalar gate, ≤k centroids/queries, bounded
  * grid, declared non-equi semantics) — the allowlist lives in
  * GlobalPlanSweepSpec ("bounded-broadcast set"). See [[PlanGrep]]. */
object BnljProbe {
  def main(args: Array[String]): Unit =
    PlanGrep.scan("BroadcastNestedLoopJoin", "BNLJ", args)
}
