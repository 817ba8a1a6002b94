package graft.core

import org.apache.spark.sql.DataFrame

/** Generation-bounded localCheckpoint registry (r21).
  *
  * Problem (guide §5 memory / §1.1 empirical): many query builders
  * localCheckpoint a per-invocation intermediate that the RETURNED
  * frame reads lazily, so it cannot be freed inside the builder —
  * and `Dataset.localCheckpoint` blocks are reclaimed only by driver
  * GC. Over a 235-query × 3-run sweep the dead generations pile up
  * in executor storage memory, and the bench showed the cost as
  * cross-query interference: queries that run in ~2 s in isolation
  * ran 2-3× slower (with multi-second GC-shaped outliers) mid-sweep.
  *
  * Contract: `checkpoint(key)(df)` localCheckpoints `df` and
  * registers it under `key` (callers use applicationId + call site +
  * input dir); the PREVIOUS generation registered under the same key
  * is unpersisted eagerly. So at most ONE live generation per call
  * site exists at any time, and every invocation still computes its
  * own fresh checkpoint — nothing is memoized, results are never
  * reused across invocations.
  *
  * Safety: the only frame whose blocks die is the previous
  * invocation's — callers of this helper are query builders whose
  * result is consumed (written/collected) before the query is built
  * again, which is how the bench, Verify, and the specs all drive
  * them. A freed localCheckpoint cannot recompute (lineage is
  * truncated), so this helper must not be used where two live
  * generations of the same site are read concurrently.
  */
object CkptSlots {
  private val slots =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def checkpoint(key: String)(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    slots.put(key, ck).foreach(
      org.apache.spark.sql.GraftSqlShims.unpersistLocalCheckpoint(_))
    ck
  }
}
