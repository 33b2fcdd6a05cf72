package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative operators (connected components, label
  * propagation, PageRank/HITS, PLSA EM, DBSCAN, dedup clustering).
  *
  * Every round of an iterative join grows the logical plan; without a
  * cut the optimizer re-analyzes an exponentially deeper tree and the
  * scheduler re-executes lost stages from round zero. `localCheckpoint`
  * cuts the lineage by storing blocks on the executors — fast, but NOT
  * tolerant to executor loss: on a real cluster with preemptible nodes a
  * 30-round job loses a block and dies (it cannot recompute — the
  * lineage is gone).
  *
  * Opt-in reliable mode: set `spark.graft.checkpoint.reliable=true` AND
  * `sparkContext.setCheckpointDir(...)` to a fault-tolerant FS path, and
  * every iterative op's round cut becomes a reliable `checkpoint()` —
  * blocks are written to the checkpoint dir, so executor death costs a
  * re-read, not a restart-from-zero. Default stays `localCheckpoint`
  * (the right call on local[n] and on clusters without preemption,
  * where the extra FS round-trip per iteration is pure overhead).
  */
object Checkpoints {

  val ReliableConf = "spark.graft.checkpoint.reliable"

  implicit class LineageCutOps(private val df: DataFrame) extends AnyVal {

    /** Cut this round's lineage: reliable `checkpoint(eager)` when
      * [[ReliableConf]] is true and a checkpoint dir is set, else
      * `localCheckpoint(eager)`. */
    def cutLineage(eager: Boolean): DataFrame = {
      val spark = df.sparkSession
      val reliable =
        spark.conf.get(ReliableConf, "false").equalsIgnoreCase("true")
      if (reliable) {
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$ReliableConf=true but no checkpoint dir is set; call " +
            "sparkContext.setCheckpointDir(<fault-tolerant path>) first")
        df.checkpoint(eager)
      } else df.localCheckpoint(eager)
    }
  }
}
