package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (self-ref closures, label
  * propagation): each round must cut the plan back to a flat scan or the
  * compiled task doubles per iteration (see SelfRefClosure's scaladoc).
  *
  * Two materialization levels:
  *   - `localCheckpoint()` (default): executor-local blocks — fast, but a
  *     lost executor loses its blocks and fails the job. Right for
  *     interactive/local runs.
  *   - `checkpoint()` (opt-in): written to the context's checkpoint
  *     directory (HDFS/S3 on a cluster) — survives executor death, the
  *     correct mode for long 100 TB-scale iterative jobs.
  *
  * Opt in per session:
  * {{{
  *   spark.sparkContext.setCheckpointDir("hdfs://…/checkpoints")
  *   spark.conf.set(Lineage.ReliableCheckpointsConf, "true")
  * }}}
  */
object Lineage {

  /** Session conf key: "true" → use reliable checkpoints (requires
    * `SparkContext.setCheckpointDir`).
    */
  val ReliableCheckpointsConf = "spark.graft.reliableCheckpoints"

  /** Materialize `df` and truncate its lineage, honoring the session's
    * checkpoint mode.
    */
  def truncate(df: DataFrame): DataFrame = {
    val session  = df.sparkSession
    val reliable = session.conf.get(ReliableCheckpointsConf, "false").toBoolean
    if (!reliable) df.localCheckpoint()
    else if (session.sparkContext.getCheckpointDir.isEmpty)
      throw new IllegalStateException(
        s"$ReliableCheckpointsConf=true requires SparkContext.setCheckpointDir(<reliable storage path>)"
      )
    else df.checkpoint()
  }
}
