package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextHash
import graft.ops.Dedup
import graft.text.Tokenize

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

/** One corpus record flowing into [[CorpusStream.incrementalDedup]]:
  * snapshot members carry snap = true, the arriving delta batch snap =
  * false.
  */
case class DocArrival(doc_id: Long, snap: Boolean, text: String)

/** A verified near-dup match emitted by the incremental dedup: delta doc
  * `d` duplicates surviving partner `p` at the given exact Jaccard.
  */
case class DeltaMatch(d: Long, p: Long, jaccard: Double)

private case class SigRecord(band: Int, sig: String, doc_id: Long, snap: Boolean, shs: Seq[Long])

private case class BucketMember(doc_id: Long, snap: Boolean, shs: Seq[Long])

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

  // ------------------------------------------------- incremental dedup twin

  /** JVM mirror of the batch shingle pipeline (graft.ops.Dedup
    * .docShinglesOf): tokenize on [[Tokenize.WordPattern]], word
    * trigrams joined with spaces, md5-derived 60-bit hashes, distinct.
    * Same regex engine, same md5, same integer arithmetic — bit-equal to
    * the Spark columns by construction.
    */
  private[streaming] def shingleSet(text: String): Set[Long] = {
    val toks = text.split(Tokenize.WordPattern).filter(_.nonEmpty)
    toks.sliding(Dedup.ShingleN).filter(_.length == Dedup.ShingleN)
      .map(w => TextHash.hash60Jvm(w.mkString(" "))).toSet
  }

  /** JVM mirror of the batch band-signature stage: lane-j min-hash over
    * the shingle set, [[Dedup.BandRows]] lanes per band joined with '-'.
    */
  private[streaming] def bandSigs(shs: Set[Long]): Seq[(Int, String)] = {
    val mh = (0 until Dedup.NumHashes).map { j =>
      shs.iterator
        .map(sh => ((sh % Dedup.ModP) * Dedup.laneA(j) + Dedup.laneB(j)) % Dedup.ModP)
        .min
    }
    (0 until Dedup.NumHashes / Dedup.BandRows).map { b =>
      b -> (0 until Dedup.BandRows).map(r => mh(b * Dedup.BandRows + r)).mkString("-")
    }
  }

  /** Streaming twin of the batch `dedup_incremental`
    * (graft.ops.Dedup.incremental): corpus records arrive as micro-batches
    * — the materialized snapshot (snap = true) and the delta batch in any
    * interleaving — and every verified near-dup match of a delta doc is
    * emitted as soon as both endpoints have been seen. The precedence rule
    * is the batch one (a delta doc matches any snapshot doc, or an
    * EARLIER-id delta doc), keyed on doc ids rather than arrival order, so
    * the emitted match set is delivery-independent.
    *
    * Shape: a stateless flatMap computes each doc's band signatures
    * executor-side (the JVM mirrors above — no shuffle to build
    * signatures), then state lives per (band, sig) LSH bucket: exactly the
    * key the batch candidate join shuffles on. Each arrival verifies exact
    * Jaccard against its bucket's members inline and appends itself. A
    * pair colliding in several bands is emitted once per band (bucket
    * state cannot see across keys), so readers take `.distinct()` —
    * mirroring the batch plan's candidate distinct.
    *
    * Scale: bucket state holds each member's shingle-hash set (~8 B per
    * shingle per band) — the streaming price of inline verification; the
    * batch twin reads those sets from the static table instead. State is
    * partitioned by bucket key like any shuffle, and hot buckets are
    * bounded by the same LSH-collision argument as the batch join.
    */
  def incrementalDedup(arrivals: Dataset[DocArrival]): Dataset[DeltaMatch] = {
    import arrivals.sparkSession.implicits._

    val sigs = arrivals.flatMap { a =>
      val shs = shingleSet(a.text)
      if (shs.isEmpty) Iterator.empty
      else bandSigs(shs).iterator.map { case (band, sig) =>
        SigRecord(band, sig, a.doc_id, a.snap, shs.toSeq)
      }
    }

    def fn(key: (Int, String), batch: Iterator[SigRecord],
        state: GroupState[Seq[BucketMember]]): Iterator[DeltaMatch] = {
      var members = state.getOption.getOrElse(Seq.empty)
      val out = Seq.newBuilder[DeltaMatch]
      batch.foreach { r =>
        val rs = r.shs.toSet
        members.foreach { m =>
          val dp =
            if (!r.snap && (m.snap || m.doc_id < r.doc_id)) Some(r.doc_id -> m.doc_id)
            else if (!m.snap && (r.snap || r.doc_id < m.doc_id)) Some(m.doc_id -> r.doc_id)
            else None
          dp.foreach { case (d, p) =>
            val ms = m.shs.toSet
            val i  = rs.count(ms)
            val j  = i.toDouble / (rs.size + ms.size - i).toDouble
            if (j >= Dedup.JaccardThreshold) out += DeltaMatch(d, p, j)
          }
        }
        members :+= BucketMember(r.doc_id, r.snap, r.shs)
      }
      state.update(members)
      out.result().iterator
    }

    sigs
      .groupByKey(r => (r.band, r.sig))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming twin of the batch `corpus_jsonl` summary: documents
    * arriving as JSONL drops (the production ingestion path — a crawler
    * or vendor delivers files into a landing directory, `readStream
    * .schema(...).json(dir)` picks each one up exactly once) fold into
    * the same per-(lang, source) integrity summary the batch round-trip
    * computes. Complete-mode output: the summary table is
    * groups-bounded (langs × sources), so re-emitting it per
    * micro-batch is O(groups), not O(corpus).
    *
    * The aggregation is [[graft.ops.Storage.corpusSummary]] verbatim —
    * counts and order-free decimal sums are exactly the shapes
    * Structured Streaming can maintain incrementally, which is WHY the
    * catalog's integrity signature was designed as a commutative sum
    * rather than an ordered digest.
    */
  def ingestProfile(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.ops.Storage.corpusSummary(docs)
}
