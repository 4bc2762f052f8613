package graft.util

import org.apache.spark.sql.DataFrame

/** One policy for every "materialize this frame and truncate lineage"
  * site (iterative loops whose plans would otherwise nest their whole
  * history; staged frames that feed 2+ consumers or get rewritten over
  * their own input).
  *
  * The switch is Spark's own reliable-checkpoint hook: when the
  * session has a checkpoint directory configured
  * (`spark.sparkContext.setCheckpointDir(hdfs://...)`), frames
  * checkpoint RELIABLY — data lands on the checkpoint filesystem and
  * survives executor loss, the correct choice on a cluster where an
  * executor death mid-iteration would otherwise lose localCheckpoint
  * blocks with no lineage left to recompute them. Without a configured
  * directory it falls back to `localCheckpoint` (executor-local
  * blocks — fastest, fine for single-node and for jobs that can simply
  * rerun). Callers opt in by configuration, not code changes.
  */
object Checkpointing {

  /** Eagerly materialize `df` with truncated lineage — reliably under
    * a configured checkpoint dir, executor-locally otherwise. */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(true)
}
