package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-iteration materialization for the iterative operators (rank family,
  * hits, label propagation, BFS, walks, duplicate-cluster sweeps).
  *
  * Default: `localCheckpoint()` — truncates the logical plan (guide §3.3;
  * per-action analysis otherwise grows quadratically with iterations) and
  * materializes eagerly, but stores blocks on executors with replication 1:
  * on a real cluster an executor loss (or dynamic-allocation decommission)
  * makes the blocks unrecoverable and kills the query.
  *
  * Escape hatch for long multi-hour cluster jobs:
  * `spark.graft.reliableCheckpointDir` routes the same materialization
  * through RELIABLE `Dataset.checkpoint()` to that DFS directory — the
  * intermediate survives executor loss at the cost of a write+read per
  * iteration. Results are identical either way (both materialize the same
  * frame; only the storage medium differs — pinned by GraphSpec's
  * reliable-checkpoint differential).
  */
private[graft] object Ckpt {
  // last dir this JVM configured on the SparkContext — setCheckpointDir
  // appends a UUID subdir, so the raw conf value can't be compared against
  // sc.getCheckpointDir to detect "already set"
  private val configured =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Materialize `df` eagerly with truncated lineage: reliable checkpoint
    * when `spark.graft.reliableCheckpointDir` is set, localCheckpoint
    * otherwise. */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    graft.GraftConf.reliableCheckpointDir(spark) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (configured.getAndSet(dir) != dir || sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(dir)
        df.checkpoint() // eager, reliable (DFS-backed)
      case None => df.localCheckpoint()
    }
  }

  /** `.pinned()` suffix form of [[pin]] — a drop-in replacement for
    * `.localCheckpoint()` at the iterative call sites. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pinned(): DataFrame = Ckpt.pin(df)
  }
}
