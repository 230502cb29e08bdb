package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared 60-bit sha256-prefix base hash for the hash-derived operators
  * (MinHash, SimHash, rolling fingerprints, hyperplane LSH planes).
  *
  * The value is the integer of the first 15 hex characters of the SHA-256
  * digest (= the first 60 bits). Chosen over xxhash64 because DuckDB computes
  * the identical integer as
  * `CAST('0x' || substring(sha256(s), 1, 15) AS BIGINT)`, which makes every
  * hash-derived operator certifiable by the driver's SQL oracle — the round-1
  * gap was exactly that the xxhash64 family had no DuckDB equivalent.
  * 60 bits also keeps all downstream modular arithmetic inside a signed
  * 64-bit Long (ANSI-safe in Spark 4, BIGINT-safe in DuckDB).
  */
object Sha60 {

  /** 2^31 − 1: the Mersenne prime used as the modulus of the permutation
    * hash families built on top of this base hash.
    */
  val Mersenne31 = 2147483647L

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** First 60 bits of sha256(bytes): first 8 digest bytes big-endian,
    * unsigned-shifted right by 4 (first 15 hex chars = first 60 bits).
    */
  def hashBytes(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def hashString(s: String): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Column form computing the identical value from built-ins — the HOF
    * twin used by parity tests and the pure-Catalyst operator formulations.
    */
  def sha60(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 15), 16, 10).cast("long")
}
