package graft.operators

/** Plan-capture switch for the `graft.Explain` dev tool (r15).
  *
  * Most registered queries end in an eager `localCheckpoint` (via
  * [[Dedup.materializeAndRelease]] or a `release` flag) so a long bench
  * session never accumulates cache/lineage pressure — but a checkpointed
  * DataFrame's `explain("formatted")` is one `Scan ExistingRDD` line: the
  * actual plan evidence (Exchange count, join strategy, PushedFilters) is
  * unreadable. Explain sets this property before planning; Bench and
  * Verify never do, so the TIMED and ORACLE-CHECKED paths are
  * byte-identical to before.
  */
private[graft] object PlanCapture {
  val Prop = "graft.explain.noRelease"
  def noRelease: Boolean = sys.props.get(Prop).contains("1")
}
