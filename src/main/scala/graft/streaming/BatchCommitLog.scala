package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Atomic per-query COMMIT LOG for non-idempotent foreachBatch sinks.
  *
  * foreachBatch is at-least-once; a GD step or a corpus append is only
  * exactly-once if the replay guard itself is trustworthy. Probing
  * `max(batch_id)` over the DATA table is not: a crash that leaves a
  * partially-visible write (some rows already carrying batch_id = id — a
  * half-committed overwrite/append on an object store with a direct
  * committer) makes the probe answer "applied" for a batch that never
  * finished. This log decouples the guard from the data: a batch counts as
  * applied ONLY once a zero-byte marker file `wm_<id>` exists under
  * `<checkpoint>/graft-commits/`, and the marker is published atomically
  * (create a dotted temp name, then a same-directory `rename` — atomic on
  * HDFS and local FS, and a single-object PUT on object stores). Data
  * writes for a replayed batch are made idempotent separately (dynamic
  * overwrite of the batch_id partition — see the callers), so the
  * crash-between-data-and-marker window replays into a clean slate.
  *
  * Living under the query's checkpoint dir means the log shares the
  * checkpoint's lifetime exactly: wiping the checkpoint (a reprocess-
  * from-scratch) wipes the commit history with it, and two queries never
  * share a log. The probe is O(1) file listing of a dir holding one or two
  * markers (older markers are pruned on commit) — it does not grow with
  * ingest history the way the max-over-table probe did.
  */
object BatchCommitLog {
  private def dir(checkpoint: String): Path = new Path(checkpoint, "graft-commits")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Highest committed batch id, or None if nothing ever committed. */
  def committed(spark: SparkSession, checkpoint: String): Option[Long] = {
    val d = dir(checkpoint)
    val f = fs(spark, d)
    if (!f.exists(d)) None
    else {
      val ids = f.listStatus(d).iterator.map(_.getPath.getName)
        .filter(_.startsWith("wm_")).map(_.stripPrefix("wm_").toLong).toSeq
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  def applied(spark: SparkSession, checkpoint: String, id: Long): Boolean =
    committed(spark, checkpoint).exists(_ >= id)

  /** Atomically publish `id` as committed; prunes older markers
    * (best-effort — `committed` takes the max regardless). */
  def commit(spark: SparkSession, checkpoint: String, id: Long): Unit = {
    val d = dir(checkpoint)
    val f = fs(spark, d)
    f.mkdirs(d)
    val tmp = new Path(d, s".wm_$id.tmp")
    f.create(tmp, true).close()
    if (!f.rename(tmp, new Path(d, s"wm_$id")))
      throw new java.io.IOException(
        s"commit-log rename failed for batch $id under $d")
    f.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("wm_") && n.stripPrefix("wm_").toLong < id)
        f.delete(st.getPath, false)
    }
  }
}
