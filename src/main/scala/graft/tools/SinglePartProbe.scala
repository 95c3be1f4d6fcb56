package graft.tools

/** Audit: which keys plan an `Exchange SinglePartition`? Each hit is a
  * deliberate bounded reduction — a single-row global aggregate, a
  * scalar watermark/threshold gate, a provably-tiny hot-set — never a
  * full-table funnel (those are banned structurally: cartesians and
  * global windows by GlobalPlanSweepSpec, per-key shapes by
  * PlanAuditSpec). The allowlist lives in GlobalPlanSweepSpec
  * ("bounded-reduction set"); output recorded in BASELINE.md (r10).
  * See [[PlanGrep]]. */
object SinglePartProbe {
  def main(args: Array[String]): Unit =
    PlanGrep.scan("Exchange SinglePartition", "SP", args)
}
