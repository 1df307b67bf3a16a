package graft

import org.apache.spark.sql.DataFrame

/** Materialization seam for iterative and multi-consumer intermediates
  * (connected-components labels, pagerank edges, BPE generations, shared
  * shingle tables).
  *
  * Default mode is `localCheckpoint(eager = true)`: blocks live on
  * executors only, which is the fastest way to truncate lineage at
  * `local[32]` — but on a real cluster an executor loss destroys blocks
  * whose lineage no longer exists, killing the job. Setting
  * `spark.graft.checkpoint.reliable=true` switches every iterative op to
  * reliable `checkpoint()` under the SparkContext checkpoint dir (set
  * one on a shared filesystem for a multi-executor cluster; a local temp
  * dir is auto-provisioned otherwise so the mode is testable on
  * local[*]). The logical result is identical — both surface as a
  * LogicalRDD scan — so downstream plan shapes do not change; only the
  * storage substrate does.
  *
  * Reliable-mode hygiene: checkpoint files are reclaimed by Spark when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, otherwise
  * they live until the checkpoint dir is deleted. [[graft.ops.Dedup
  * .freeCheckpoint]] (which unpersists superseded localCheckpoint
  * generations mid-loop) degrades to a harmless no-op on reliable
  * checkpoints — their RDDs hold no block-manager storage.
  */
object Ckpt {
  /** Session conf key: "true" → reliable `checkpoint()` instead of
    * `localCheckpoint()`.
    */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Session conf key: "true" → [[cached]] entries store their blocks
    * SERIALIZED (MEMORY_AND_DISK_SER) instead of the deserialized
    * default. Memoized generations outlive the query that built them
    * and accumulate for the session; in a memory-constrained session
    * the deserialized footprint can starve later queries' working
    * memory (measured at sf1 with TWO scale factors' caches standing:
    * text_bm25's back-to-back runs degraded 24 → 65 → 98 s, and ran a
    * tight 30 s ±1 solo). The serialized mode caps the footprint but
    * costs a decode on EVERY scan — measured ~10× on the hot-stream
    * consumers (dedup_ngram 1.7 → 16.2 s, graph_common_neighbors
    * 13.3 → 44.7 s at sf1) — so the fast deserialized layout stays the
    * default and the knob is for sessions that would otherwise thrash.
    * (At genuine cluster scale these intermediates become persisted
    * tables — see the localCheckpoint note in Graph.scala — and
    * neither RAM layout applies.) The flag is part of each entry's
    * cache identity (like the reliable substrate), so flipping it
    * mid-session builds fresh entries under the new layout instead of
    * silently serving blocks stored under the other one.
    */
  val CachedSerKey = "spark.graft.cached.serialized"

  /** Session conf key: block-manager storage-used fraction above which
    * a NEW cached build first evicts least-recently-used standing
    * entries ([[maybeEvict]]). Default [[DefaultEvictFraction]].
    */
  val EvictFractionKey = "spark.graft.cached.evictFraction"
  val DefaultEvictFraction = 0.75

  /** Entries inside this most-recently-touched window are never evicted:
    * a build thunk composes the memoized frames it just looked up (the
    * deepest catalog build touches ~5 entries), and evicting one of
    * those mid-construction would hand the in-flight plan a scan over
    * freed blocks. The window is comfortably above the deepest
    * composition depth in the catalog.
    */
  private val ProtectMru = 12

  private final class Entry(
      val df: DataFrame, val userKey: String, var tick: Long)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Entry]()
  private var ticks = 0L
  private val log = scala.collection.mutable.ArrayBuffer[(String, Double)]()

  /** Per-application MEMOIZED checkpoint — the
    * [[graft.ops.Graph.coPurchaseEdges]] discipline as a shared helper.
    *
    * A checkpoint scanned by the RETURNED DataFrame can never be freed
    * inside the query (the caller's action still needs its blocks), so a
    * catalog entry that checkpoints per invocation accumulates one dead
    * generation of executor blocks per call under the gate + bench's
    * repeated runs (r8 advice). Keying the materialization by
    * (applicationId, key) makes every re-invocation REUSE the first
    * call's blocks instead: storage is bounded by one generation per
    * query family per session, and the repeated-run bench stops
    * re-paying (and re-sampling the noise of) the heavy shared subtree.
    * The applicationId in the key keeps a fresh session from ever
    * scanning a dead application's blocks.
    *
    * Footprint management (r13 verdict item 1 — entries used to live
    * until the application died, which is what degraded text_bm25
    * 24→98 s over back-to-back sf1 repeats): entries are rebuildable by
    * construction (the thunk is re-evaluated on the next miss), so the
    * cache may DROP them — explicitly via [[release]] (harness calls it
    * between scale factors) or automatically via [[maybeEvict]] when
    * block-manager storage crosses [[EvictFractionKey]]. Consumers must
    * therefore never hold a returned frame across other queries'
    * builds; catalog functions re-resolve through `cached` on every
    * invocation, which is exactly that discipline.
    *
    * Deliberately synchronized get/put, NOT `computeIfAbsent`: cached
    * builds nest (`Graph.coPurchaseLabels`'s thunk builds the memoized
    * adjacency, itself a `cached` entry), and a nested
    * `computeIfAbsent` on one ConcurrentHashMap is a recursive update —
    * an IllegalStateException whenever the two keys land in the same
    * bin, which they do or don't depending on the applicationId baked
    * into the key, i.e. an intermittent per-session failure. A plain
    * monitor is reentrant, so nested builds are always safe; the lock
    * is coarse but builds are rare (one per query family per session)
    * and the catalog mains are single-threaded.
    */
  def cached(s: org.apache.spark.sql.SparkSession, key: String)(
      build: => DataFrame): DataFrame = cache.synchronized {
    // the storage substrate and RAM layout are part of the entry's
    // identity: a session that flips to reliable mode must NOT be handed
    // blocks that a local-mode build materialized (they don't survive
    // executor loss — the exact guarantee the flip buys), and a session
    // that flips the serialized knob must not be served deserialized
    // blocks whose footprint the knob exists to cap
    val k = (s.sparkContext.applicationId
      + (if (confFlag(s, ReliableKey)) "#reliable" else "")
      + (if (confFlag(s, CachedSerKey)) "#ser" else ""), key)
    Option(cache.get(k)) match {
      case Some(e) =>
        ticks += 1; e.tick = ticks
        e.df
      case None =>
        maybeEvict(s)
        val t0 = System.nanoTime()
        val df = materialize(build, sessionLived = true)
        log += ((key, (System.nanoTime() - t0) / 1e9))
        ticks += 1
        cache.put(k, new Entry(df, key, ticks))
        df
    }
  }

  private def confFlag(s: org.apache.spark.sql.SparkSession, key: String) =
    s.conf.getOption(key).exists(_.equalsIgnoreCase("true"))

  /** Unpersist and forget every memoized entry whose user key contains
    * `substr` — keys embed their data dir (`dedup:shingles:<dir>`), so
    * `release(dir)` drops one scale factor's whole cache, and
    * `release("")` is the documented drop-ALL form (every key contains
    * the empty string). Harness use:
    * [[ScaleSweep]] calls it between the sf0.1 and sf1 phases so the
    * sf1 numbers never share executor storage with a dead SF's caches
    * (the measured text_bm25 degradation mode). Returns the number of
    * entries dropped; each next use rebuilds bit-equal from its thunk.
    */
  def release(substr: String): Int = cache.synchronized {
    import scala.jdk.CollectionConverters._
    val victims = cache.entrySet().asScala.toList
      .filter(_.getValue.userKey.contains(substr))
    victims.foreach(e => drop(e.getKey, e.getValue))
    victims.size
  }

  /** (user key, build wall seconds) of every cached build this session,
    * in build order. A key appears once per MATERIALIZATION — a rebuild
    * after [[release]]/eviction appends a new row — so [[Bench]] can
    * report one-time cache-build cost as a first-class line instead of
    * letting memoization silently shift it out of per-query medians.
    */
  def buildLog: Seq[(String, Double)] = cache.synchronized(log.toList)

  /** Fraction of block-manager storage currently used across executors. */
  private def storageUsedFraction(s: org.apache.spark.sql.SparkSession): Double = {
    val st  = s.sparkContext.getExecutorMemoryStatus.values
    val max = st.iterator.map(_._1).sum
    if (max <= 0L) 0.0
    else 1.0 - st.iterator.map(_._2).sum.toDouble / max
  }

  /** LRU eviction pass, run before building a NEW entry: while storage
    * use exceeds the configured fraction, unpersist the least-recently-
    * used entries outside the [[ProtectMru]] window. Safe by the same
    * argument that makes entries rebuildable: an evicted entry's next
    * consumer re-enters [[cached]], misses, and re-materializes — only a
    * frame held ACROSS other builds could observe freed blocks, and the
    * protection window covers every composition the catalog performs.
    */
  private def maybeEvict(s: org.apache.spark.sql.SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val threshold = s.conf.getOption(EvictFractionKey)
      .flatMap(v => scala.util.Try(v.toDouble).toOption)
      .getOrElse(DefaultEvictFraction)
    if (storageUsedFraction(s) <= threshold) return
    val lru = cache.entrySet().asScala.toList.sortBy(_.getValue.tick)
    val evictable = lru.dropRight(math.min(ProtectMru, lru.size))
    for (e <- evictable if storageUsedFraction(s) > threshold) {
      System.err.println(
        f"[ckpt] storage ${storageUsedFraction(s) * 100}%.0f%% > ${threshold * 100}%.0f%% — evicting LRU entry ${e.getValue.userKey}")
      drop(e.getKey, e.getValue)
    }
  }

  private def drop(k: (String, String), e: Entry): Unit = {
    cache.remove(k)
    for (r <- scanRdds(e.df))
      try r.unpersist(blocking = true)
      catch { case scala.util.control.NonFatal(_) => () }
  }

  /** The checkpoint-scan RDDs of a materialized frame (exactly one for a
    * [[cached]] entry). Unpersisting them frees localCheckpoint blocks;
    * on reliable checkpoints it is a no-op (file-backed, no storage).
    */
  private def scanRdds(df: DataFrame) =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  def apply(df: DataFrame): DataFrame = materialize(df, sessionLived = false)

  /** True when the frame is already just a rename/reorder projection
    * over a checkpoint scan — re-materializing such a frame copies every
    * block for nothing (and, on catalog paths, leaks a per-invocation
    * generation the returned plan pins). Callers that free their
    * checkpoint later must gate the free on this (freeing a SHARED
    * memoized scan would unpersist blocks other consumers still need).
    */
  def isCheapScan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    def walk(p: LogicalPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case pr: Project if pr.projectList.forall {
            case _: Attribute => true
            case a: Alias     => a.child.isInstanceOf[Attribute]
            case _            => false
          } =>
        walk(pr.child)
      case s: SubqueryAlias => walk(s.child)
      case _                => false
    }
    walk(df.queryExecution.analyzed)
  }

  /** Materialize unless [[isCheapScan]] — the memoized-input fast path. */
  def ensure(df: DataFrame): DataFrame =
    if (isCheapScan(df)) df else apply(df)

  private def materialize(df: DataFrame, sessionLived: Boolean): DataFrame = {
    val spark    = df.sparkSession
    val reliable = confFlag(spark, ReliableKey)
    val ser      = sessionLived && confFlag(spark, CachedSerKey)
    if (reliable) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(
          java.nio.file.Files.createTempDirectory("graft-ckpt-").toString)
      df.checkpoint(eager = true)
    } else if (ser)
      df.localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    else df.localCheckpoint(eager = true)
  }
}
