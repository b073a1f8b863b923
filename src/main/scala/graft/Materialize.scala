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

  /** PlanAuditSpec enables this for the duration of its audit: a
    * localCheckpoint truncates the plan to an RDD scan, which would hide
    * every upstream join/exchange from the plan-shape gate (a cartesian
    * introduced inside a checkpointed subtree could never fail the
    * audit). Transparent mode skips the checkpoint so audits see the
    * WHOLE plan; production behavior is unchanged (only the audit suite
    * enables it; plan construction stays cheap — q100's lambda does run
    * its driver-side k-means collects at build time, but those are the
    * query's own small jobs, not checkpoint materializations).
    *
    * THREAD-LOCAL, not a process global: query lambdas built on other
    * threads (graft.Verify's 4-thread submitter pool, any future
    * parallel suite) must never observe another thread's audit window —
    * the same scoping discipline the engine applies to session-conf
    * mutation around streaming runs.
    */
  private val transparentFlag: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  def transparent: Boolean = transparentFlag.get()

  def withTransparent[A](body: => A): A = {
    // restore (not reset) on exit: a nested withTransparent — two audited
    // helpers composed in one spec — must not end the outer transparent
    // window early and let checkpoints truncate the rest of the audit
    val prev = transparentFlag.get()
    transparentFlag.set(java.lang.Boolean.TRUE)
    try body finally transparentFlag.set(prev)
  }

  def checkpoint(df: DataFrame): DataFrame =
    if (transparent) df else df.localCheckpoint()
}
