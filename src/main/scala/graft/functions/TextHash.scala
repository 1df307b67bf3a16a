package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing and shingling primitives.
  *
  * The dedup operators (MinHash, SimHash) need a hash function that is
  * bit-identical in Spark and in the DuckDB oracle. Neither engine's
  * native `hash()` matches the other, so we derive a 60-bit integer from
  * md5 (identical lowercase hex in both engines):
  *
  *   Spark : conv(substring(md5(s), 1, 15), 16, 10) :: long
  *   DuckDB: ('0x' || substring(md5(s), 1, 15)) :: BIGINT
  *
  * 15 hex digits = 60 bits, always positive, no sign traps. Seeded
  * variants prefix `"<seed>:"` — an md5-family hash per seed, which is
  * what MinHash needs for its independent permutations.
  *
  * All of this stays in codegen'd built-ins (md5 / conv / substring), so
  * the hot path is whole-stage-codegen friendly at 100 TB scale.
  */
object TextHash {

  /** 60-bit md5-derived hash of a string column. */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** The same hash evaluated driver-side — for precomputing small
    * deterministic constant tables (e.g. LSH hyperplane weights) that
    * then ship to executors as literals instead of per-row md5 calls.
    */
  def hash60Jvm(s: String): Long = {
    val d   = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL fragment equivalents (kept adjacent so the two sides
    * can't drift): substitute the string expression for %s.
    */
  val duckHash60: String        = "CAST('0x' || substring(md5(%s), 1, 15) AS BIGINT)"
  def duckHash60Of(e: String): String = duckHash60.format(e)

  /** Word-level n-gram shingles from a token array column (n >= 2):
    * zip the array with its shifted self and join with spaces.
    */
  def shingles(tokens: Column, n: Int): Column = {
    require(n >= 1)
    if (n == 1) tokens
    else {
      // slide a window of n over the token array via transform on indices;
      // sequence(a, b) is descending when b < a, so short arrays need the
      // explicit empty branch.
      val sz  = size(tokens)
      val idx = when(sz >= lit(n), sequence(lit(0), sz - lit(n)))
        .otherwise(array().cast("array<int>"))
      transform(
        idx,
        i => concat_ws(" ", (0 until n).map(k => element_at(tokens, (i + lit(k + 1)).cast("int"))): _*))
    }
  }
}
