package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.streaming.GroupState

/** One corpus-version record flowing into the incremental diff: `ver` 1
  * is the materialized baseline snapshot, `ver` 2 the new snapshot's
  * records as they land.
  */
case class DocVer(doc_id: Long, ver: Int, digest: String)

/** A document's current diff status after `n_seen` of its version
  * records have arrived. The LAST update per doc (max `n_seen`) is the
  * settled answer; earlier updates are the monotone refinements an
  * incremental diff legitimately emits (a baseline-only doc reads
  * `removed` until/unless its v2 record lands).
  */
case class DocDiff(doc_id: Long, n_seen: Long, status: String)

private case class DiffState(d1: String, d2: String, n: Long)

/** Incremental corpus maintenance: the streaming twin of the batch
  * `corpus_diff` (graft.ops.Dedup.snapshotDiff), following the same
  * delta-merge discipline as `events_incr_hourly` — a materialized
  * baseline merged with arriving deltas through per-key state rather
  * than a full recompute.
  *
  * The batch query is one full-outer join of two complete snapshots on
  * doc_id. Incrementally, both sides stream in as [[DocVer]] records
  * (baseline first in production, but the fold is order-independent)
  * and the join state is maintained per key: each doc's state is just
  * its two content digests — never the text, mirroring the batch plan's
  * "only doc_id + md5 through the shuffle" discipline. After any prefix
  * of the stream the emitted statuses are exactly the batch diff of the
  * records seen so far; once both snapshots have drained they equal the
  * batch answer row-for-row.
  *
  * Scale: state is keyed by doc_id — partitioned by the shuffle like
  * any agg, ~80 bytes per live doc, bounded by corpus keys rather than
  * stream length; no timer/watermark needed because a diff over two
  * finite snapshots settles by arrival, not by time.
  */
object CorpusStream extends Serializable {

  def corpusDiff(updates: Dataset[DocVer]): Dataset[DocDiff] = {
    import updates.sparkSession.implicits._

    def fn(id: Long, batch: Iterator[DocVer], state: GroupState[DiffState]): DocDiff = {
      var s = state.getOption.getOrElse(DiffState(null, null, 0L))
      batch.foreach { r =>
        s =
          if (r.ver == 1) DiffState(r.digest, s.d2, s.n + 1)
          else DiffState(s.d1, r.digest, s.n + 1)
      }
      state.update(s)
      val status =
        if (s.d2 == null) "removed"
        else if (s.d1 == null) "added"
        else if (s.d1 == s.d2) "unchanged"
        else "changed"
      DocDiff(id, s.n, status)
    }

    updates
      .groupByKey(_.doc_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }
}
