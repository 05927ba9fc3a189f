package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Frees the storage behind a materialized (localCheckpoint'd /
  * checkpoint'd) DataFrame.
  *
  * `Dataset.unpersist` only uncaches CacheManager entries (`.cache()` /
  * `.persist()` plans); a checkpointed Dataset's plan is a [[LogicalRDD]]
  * that was never registered there, so unpersist on it is a silent no-op
  * and the checkpoint blocks stay pinned until GC. Iterative loops that
  * materialize per round must instead unpersist the UNDERLYING RDD —
  * that is what actually drops the blocks and keeps pinned executor
  * memory O(1) across rounds.
  *
  * The frame handed in is often not the bare checkpoint but a cheap
  * projection over it (e.g. kmeansRounds frees `withPrev.drop(col)`, a
  * Project over the LogicalRDD), so the whole logical plan is traversed
  * and EVERY LogicalRDD under it is unpersisted — a round's frame never
  * contains another round's checkpoint (each round starts from its own
  * materialization), so the traversal cannot free live blocks.
  *
  * After this call the frame is UNRECOMPUTABLE (localCheckpoint already
  * truncated its lineage) — only free a round once its successor is
  * fully materialized and the round is never read again.
  */
object Materialize {
  def free(df: DataFrame): Unit = {
    val rdds = df.queryExecution.logical.collect { case l: LogicalRDD => l }
    if (rdds.isEmpty) df.unpersist(blocking = false)
    else rdds.foreach(_.rdd.unpersist(blocking = false))
  }
}
