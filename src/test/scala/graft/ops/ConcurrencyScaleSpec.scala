package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Cost/output model of the bucket-decomposed interval join behind
  * `events_concurrency` (round-12 verdict stretch item): work and output
  * scale with BUCKET-LOCAL pair mass Σ_b |sessions_b|·|events_b| —
  * linear when the corpus grows by extending the time range (real event
  * history), quadratic when density grows on a fixed range (the sf1
  * replica's 15× growth was true-output growth of exactly this shape).
  * The constructed fixtures make both regimes exact.
  */
class ConcurrencyScaleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** `buckets` hour buckets × `perBucket` users each; every user emits 3
    * events at the same minute marks of its bucket, so each user is one
    * session spanning [t0, t2] and every other same-bucket event falls
    * inside it. Expected output: perBucket×buckets sessions, each with
    * n_concurrent = 3·(perBucket−1).
    */
  private def fixture(buckets: Int, perBucket: Int) = {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    val rows = for {
      b <- 0 until buckets
      u <- 0 until perBucket
      k <- 0 until 3
    } yield {
      val uid = (b * perBucket + u).toLong
      val sec = base + b * 3600L + 300L + k * 300L // :05, :10, :15
      (uid * 10 + k, new java.sql.Timestamp(sec * 1000L), uid, "click", 1.0)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private def mass(buckets: Int, perBucket: Int): (Long, Long) = {
    val out = Events.sessionConcurrencyOf(fixture(buckets, perBucket))
      .agg(count(lit(1)).as("sessions"), sum("n_concurrent").as("pairs"))
      .collect()(0)
    (out.getLong(0), out.getLong(1))
  }

  test("time-range growth at constant density is LINEAR in buckets") {
    val (s1, p1) = mass(buckets = 5, perBucket = 4)
    val (s2, p2) = mass(buckets = 10, perBucket = 4)
    assert(s1 == 20 && p1 == 20L * 3 * 3, s"base: $s1 sessions, $p1 pairs")
    // 2x the hours at the same per-hour density: exactly 2x the output
    assert(s2 == 2 * s1 && p2 == 2 * p1, s"2x range: $s2 sessions, $p2 pairs")
  }

  test("density growth on a FIXED range is quadratic per bucket (true-output growth)") {
    val (_, p1) = mass(buckets = 5, perBucket = 4)  // 20 sessions x 9
    val (_, p2) = mass(buckets = 5, perBucket = 8)  // 40 sessions x 21
    assert(p1 == 5L * 4 * 3 * 3 && p2 == 5L * 8 * 3 * 7,
      s"pair masses: $p1, $p2")
    // 2x density -> ~4.7x pair mass here (2k(3(k... exact: 2·(2k−1)/(k−1)),
    // i.e. super-linear BY CONSTRUCTION of the semantics, not a plan flaw
    assert(p2 > 4 * p1 && p2 < 5 * p1)
  }

  test("cross-bucket sessions still count each event exactly once") {
    // one session straddling an hour boundary (events at :55, :58, +:02)
    // fans out to TWO buckets; the other user's single event must be
    // counted once, through the one bucket that contains it
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    def ts(sec: Long) = new java.sql.Timestamp((base + sec) * 1000L)
    val ev = Seq(
      (1L, ts(3300L), 10L, "click", 1.0),  // :55
      (2L, ts(3480L), 10L, "click", 1.0),  // :58
      (3L, ts(3720L), 10L, "click", 1.0),  // 1:02
      (4L, ts(3540L), 20L, "click", 1.0))  // :59 — inside user 10's span
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = Events.sessionConcurrencyOf(ev).collect()
    val u10 = rows.find(_.getLong(0) == 10L).get
    assert(u10.getLong(2) == 1L, s"expected 1 concurrent event, got ${u10.getLong(2)}")
  }
}
