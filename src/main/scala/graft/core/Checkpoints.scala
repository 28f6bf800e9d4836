package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage truncation for iterative driver loops (q68's label
  * propagation): each round's frame must become a constant-size leaf or
  * round k's plan re-embeds — and silently recomputes — the whole
  * upstream pipeline (measured ~15 s/round on q68 before truncation;
  * cache lookup misses the fresh self-joined aliases, see the q68
  * scaladoc).
  *
  * Two modes, selected by `GRAFT_CHECKPOINT_DIR`:
  *
  *  - unset (the single-JVM sandbox, specs, bench): `localCheckpoint` —
  *    blocks live on the executors, zero I/O, but an executor loss kills
  *    the lineage-free RDD with no recompute path;
  *  - set (a production cluster): `sparkContext.setCheckpointDir` +
  *    reliable `checkpoint()` — rounds materialize to fault-tolerant
  *    storage (HDFS/S3), so a 1000-executor job that loses a node mid-
  *    iteration replays from the checkpoint files instead of dying.
  *    Superseded round files are reclaimed by the ContextCleaner when
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`; with ≤25
  *    rounds the transient footprint is bounded either way.
  *
  * Both modes are eager: the frame materializes at truncation so the
  * caller can release its predecessor immediately ([[release]] — the
  * round-8 advice was that superseded round frames accumulated in the
  * block manager until GC).
  */
object Checkpoints {

  /** The production switch. An empty value means local mode. */
  def dirFromEnv(env: Map[String, String] = sys.env): Option[String] =
    env.get("GRAFT_CHECKPOINT_DIR").map(_.trim).filter(_.nonEmpty)

  /** Truncate `df`'s lineage to a materialized leaf (eager). The
    * checkpoint dir is set once per SparkContext from the first reliable
    * call; later calls with a different dir keep the established one
    * (one job, one checkpoint root). */
  def truncate(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
      df.checkpoint()
    case None => df.localCheckpoint()
  }

  /** Release the materialized blocks behind a SUPERSEDED truncated frame.
    * Only call when nothing will read `df` again: for a localCheckpoint
    * the blocks ARE the data (no recompute path exists afterwards).
    * No-op on frames whose RDD holds no blocks — a reliable checkpoint's
    * data lives in files, unpersist just drops any cached copy — so
    * calling it twice, or once more at drain time, is safe. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
