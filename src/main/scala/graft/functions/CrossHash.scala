package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing primitives.
  *
  * The correctness oracle (DuckDB) must reproduce every hash-derived
  * value bit-for-bit, so none of Spark's native hashes (xxhash64,
  * murmur3) are usable — their algorithms differ from DuckDB's `hash()`.
  * `md5` is the one hash both engines implement identically; we parse
  * the first 15 hex chars (60 bits, fits a signed 64-bit) into a long:
  *
  *  - Spark : `conv(substring(md5(s), 1, 15), 16, 10)` cast to long
  *  - DuckDB: `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`
  *
  * At 100 TB one would swap this for `xxhash64` (no oracle to match,
  * ~20× cheaper than md5); the operator shapes are hash-agnostic —
  * every consumer takes the hash as a `Column` so the swap is one line.
  */
object CrossHash {

  /** Modulus for minhash/fingerprint modular arithmetic: the largest
    * 31-bit prime. Keeps every intermediate product within a signed
    * 64-bit: a*h ≤ 1e6 * (P-1) < 2^51.
    */
  val P: Long = 1000000007L

  /** Published MinHash permutation count and coefficients
    * (h_i(x) = (x·a_i + b_i) mod [[P]]) — the single source of truth
    * consumed by both the declarative operator layer
    * ([[graft.operators.Dedup]]) and the codegen'd
    * [[graft.functions.MinHash16]] expression, so the two can never
    * drift. a_i ≤ 37+101·15 keeps a_i·h < 2^51 for h < P.
    */
  val MinHashK: Int = 16
  val MinHashAs: IndexedSeq[Long] = (0 until MinHashK).map(i => 37L + 101L * i)
  val MinHashBs: IndexedSeq[Long] = (0 until MinHashK).map(i => 17L + 997L * i)

  /** 60-bit hash of a string column (see object doc). Non-negative. */
  def md5Long(c: Column): Column = longOfMd5(md5(c.cast("string")))

  /** md5Long reduced mod P — safe operand for (a*h + b) % P families. */
  def md5Mod(c: Column): Column = md5Long(c) % P

  /** The 60-bit parse applied to an ALREADY-computed md5 hex digest —
    * for consumers that also emit the digest itself and must not hash
    * the content twice. `longOfMd5(md5(c)) ≡ md5Long(c)` by
    * construction (one definition of the 15-hex-char parse).
    */
  def longOfMd5(hex: Column): Column =
    conv(substring(hex, 1, 15), 16, 10).cast("long")

  // ---- oracle-side (DuckDB SQL) fragments; MUST mirror the above ----

  def md5LongSql(e: String): String =
    s"CAST(('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 15)) AS BIGINT)"

  def md5ModSql(e: String): String = s"(${md5LongSql(e)} % $P)"

  /** Oracle-side sequential dot product over 1-based list indices — the
    * same left-to-right fold as [[DotProduct]], so doubles match
    * bitwise. Shared by every cosine/norm oracle; keep ONE copy — a
    * reassociated fold in one consumer would silently break parity.
    */
  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])),
      (acc, v) -> acc + v)"""
}
