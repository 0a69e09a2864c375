package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The guarded broadcast hint the incremental-delta operators share
  * (incremental LPA / PageRank / exact-substring dedup): their deltas are
  * frontier-bounded by design, but each family documents a worst case
  * that blows a delta to O(stored) — an unconditional hint would then die
  * on the broadcast size limit / driver memory instead of degrading.
  * Every delta passed here is localCheckpointed by its caller, so the
  * count is a cheap in-memory scan; above the bound the planner's shuffle
  * join makes the round slow but correct. */
private[graft] object Broadcasting {
  def hintIfSmall(df: DataFrame, maxRows: Long): DataFrame =
    if (df.count() <= maxRows) broadcast(df) else df
}
