package graft

import org.apache.spark.sql.DataFrame

/** The materialization point for reused query-lambda intermediates
  * (LSH signature tables, ANN indexes, shingle sets): an EAGER
  * localCheckpoint, so the expensive kernel runs once, downstream
  * branches read blocks, and the ContextCleaner frees them when the
  * returned plan is dropped — no session-lifetime cache-manager entry
  * (the contract CacheOwnershipSpec gates; bare persist() leaks one
  * entry per invocation with no owner to unpersist).
  */
object Materialize {

  /** PlanAuditSpec sets this for the duration of its audit: a
    * localCheckpoint truncates the plan to an RDD scan, which would hide
    * every upstream join/exchange from the plan-shape gate (a cartesian
    * introduced inside a checkpointed subtree could never fail the
    * audit). Transparent mode skips the checkpoint so audits see the
    * WHOLE plan; production behavior is unchanged (the flag is only set
    * by the audit suite, which builds plans without executing them).
    */
  @volatile var transparent: Boolean = false

  def checkpoint(df: DataFrame): DataFrame =
    if (transparent) df else df.localCheckpoint()
}
