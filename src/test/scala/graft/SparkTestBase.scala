package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test JVM. `local[4,2]` = 4 threads
  * with maxFailures=2, so the crash-recovery behavioral spec (mirroring
  * the reference's crash test, `play.sh:268-315`) can exercise task retry.
  */
trait SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4,2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
}
