package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-independent hashing for dedup/LSH (MinHash, SimHash).
  *
  * The base hash is the first 8 hex chars of md5 interpreted as a uint32 —
  * chosen because it is bit-identical in Spark (`conv(substring(md5,1,8),
  * 16,10)`) and the DuckDB oracle (`('0x'||substr(md5(x),1,8))::BIGINT`),
  * so the whole MinHash/SimHash pipeline is differential-testable.
  * md5 is codegen'd in Spark; at 100 TB this is scan-dominated work with
  * no shuffle until the band-bucket join.
  */
object HashF {

  /** md5-prefix uint32 token hash in [0, 2^32). */
  def tokenHash(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Universal-hash family h_i(x) = (a_i*x + b_i) mod p over uint32 hashes.
    * p = first prime above 2^32; a_i kept < 2^20 so a*x < 2^52 (no 64-bit
    * overflow in either engine). Seeds are fixed constants shared with the
    * oracle SQL — keep in sync with `graft.queries.ExtQueries`. */
  val MinhashPrime: Long = 4294967311L
  val MinhashSeeds: Seq[(Long, Long)] = Seq(
    (1000003L, 12345L), (999983L, 54321L), (824633L, 98765L), (786433L, 19283L),
    (655360L, 56789L), (524287L, 11111L), (331777L, 77777L), (131071L, 33333L))

  def minhashHash(hv: Column, a: Long, b: Long): Column =
    (lit(a) * hv + lit(b)) % lit(MinhashPrime)

  /** SimHash bit width (uint32 base hash → 32-bit fingerprint). */
  val SimhashBits: Int = 32

  /** Per-token SimHash contribution for bit j: +1 if bit set, else -1.
    * j is a compile-time literal → unrolled into 32 codegen'd aggregates
    * (no 32x explode; at 100 TB that factor matters). */
  def simhashBitContrib(hv: Column, j: Int): Column =
    when(shiftright(hv, j) % 2 === 1, 1).otherwise(-1)

  /** Collapse the 32 per-bit weight sums into the SimHash value. Inputs are
    * the aggregated per-doc weight columns, index-aligned with bit j. */
  def simhashFromWeights(weights: Seq[Column]): Column =
    weights.zipWithIndex.map { case (w, j) =>
      when(w > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming distance between two SimHash values (bit_count of xor). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
