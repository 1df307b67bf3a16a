package graft

import org.apache.spark.sql.SparkSession

/** Harness diagnostic (round 14): isolate the MECHANISM of the
  * text_bm25 / graph_common_neighbors back-to-back sf1 degradation.
  *
  * r13 measured bm25 24→65→98 s across repeats in a session holding the
  * catalog's standing memoized caches (tight ±1 s solo); r14's bounded
  * cache (release between SFs + storage-fraction LRU) did NOT cure the
  * within-SF pattern (sweep sample: 23.1 → ~70 → 119.6 s, n=3). The
  * standing footprint is CONSTANT across those three repeats — so either
  * (a) the standing caches make each repeat slower via some accumulating
  * interaction (GC pressure, unified-memory eviction churn), or (b) the
  * degradation is the session's own per-repeat debris (broadcasts,
  * shuffle files, block-manager bookkeeping) and the caches are merely
  * the baseline load.
  *
  * Protocol (prints one line per run with wall seconds, GC-time delta,
  * heap after GC, block-manager storage fraction, persisted-RDD
  * mem/disk bytes, and spark.local.dir growth):
  *   1. one full catalog pass at the target dir (stands every cache);
  *   2. text_bm25 × 5 back-to-back (GC + 200 ms between, like the sweep);
  *   3. graph_common_neighbors × 3 (the other weak-spread query);
  *   4. Ckpt.release("") — the empty key substring-matches every entry,
  *      i.e. drop ALL standing memoized state — then text_bm25 × 2 more.
  * If step 4 snaps back to the solo time, the standing caches are causal
  * (fix: bound/evict harder, or serialize the big read-rarely entries);
  * if it stays slow, the cause is per-repeat session debris (fix:
  * cleaner hygiene between repeats, e.g. blocking ContextCleaner).
  */
object Diag {
  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  private def dirBytes(p: java.io.File): Long =
    if (!p.exists()) 0L
    else if (p.isFile) p.length()
    else Option(p.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    val localRoot = new java.io.File(
      sc.getConf.get("spark.local.dir", System.getProperty("java.io.tmpdir")))
    def localDirBytes: Long = Option(localRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-"))
      .map(dirBytes).sum

    def storageFrac: Double = {
      val st  = sc.getExecutorMemoryStatus.values
      val max = st.iterator.map(_._1).sum
      if (max <= 0L) 0.0 else 1.0 - st.iterator.map(_._2).sum.toDouble / max
    }
    def rddStorage: (Int, Long, Long) = {
      val infos = sc.getRDDStorageInfo
      (infos.length, infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }

    var lastGc = gcMs
    def probe(tag: String, sec: Double): Unit = {
      val g  = gcMs; val dg = g - lastGc; lastGc = g
      System.gc(); Thread.sleep(200)
      val rt = Runtime.getRuntime
      val heapGb = (rt.totalMemory - rt.freeMemory) / 1e9
      val (nRdd, memB, diskB) = rddStorage
      println(f"[diag] $tag%-28s ${sec}%7.2f s  gc+${dg}%6d ms  heapAfterGc ${heapGb}%5.1f GB  " +
        f"storage ${storageFrac * 100}%4.1f%%  rdds $nRdd%3d (${memB / 1e9}%5.2f GB mem, ${diskB / 1e9}%5.2f GB disk)  " +
        f"localdir ${localDirBytes / 1e9}%6.2f GB")
    }

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // 1. stand every cache with one full catalog pass
    val t0 = System.nanoTime()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try fn(spark, dir).count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[diag] $name failed: ${e.getMessage}") }
    }
    probe("catalog-pass", (System.nanoTime() - t0) / 1e9)

    // 2. bm25 back-to-back with standing caches
    for (i <- 1 to 5) probe(s"text_bm25 #$i", run("text_bm25"))

    // 3. common_neighbors spread with standing caches
    for (i <- 1 to 3) probe(s"graph_common_neighbors #$i", run("graph_common_neighbors"))

    // 4. drop every memoized entry, then bm25 again
    val dropped = Ckpt.release("")
    System.gc(); Thread.sleep(500)
    probe(s"after release($dropped entries)", 0.0)
    for (i <- 1 to 2) probe(s"text_bm25 postrelease #$i", run("text_bm25"))

    spark.stop()
  }
}
