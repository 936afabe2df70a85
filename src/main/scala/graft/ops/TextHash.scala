package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text-hashing primitives for the dedup / similarity family.
  *
  * All hashing goes through [[h56]]: the first 14 hex chars of md5 parsed as
  * a 56-bit non-negative long. md5 is bit-identical everywhere, so the DuckDB
  * oracle (`('0x' || substr(md5(s),1,14))::BIGINT`) produces the same values
  * — the whole near-dup pipeline is engine-portable and deterministic, with
  * no dependence on Spark's (non-portable) xxhash64/murmur. 56 bits keeps
  * every value positive, so bit shifts and integer division behave
  * identically in both engines.
  */
object TextHash {

  /** 56-bit md5-prefix hash (non-negative long). */
  def h56(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** Python-str.split() style whitespace tokenization of lowered text. */
  def words(text: Column): Column =
    filter(split(lower(text), """\s+"""), w => w =!= "")

  /** Distinct word k-shingles ("a b c" strings). Caller must guard
    * size(words) >= k (Spark `sequence` is descending for stop < start).
    */
  def shingles(words: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(0), size(words) - k),
      i => concat_ws(" ", slice(words, i + lit(1), lit(k)))))

  /** Mersenne-ish prime for the affine rehash family (fits 31 bits, so
    * a*h31 stays under 2^51 — no long overflow in either engine).
    */
  val P31 = 2147483647L

  /** Affine-hash constants, derived deterministically; a < 2^20 bounds the
    * product. Mirrored literally into the oracle SQL (SqlText).
    */
  def affineA(i: Int): Long = (i * 19349663L + 7919L) % 1048573L + 1L
  def affineB(i: Int): Long = (i * 83492791L + 15485863L) % P31

  /** K minhash values via the standard one-base-hash trick: each shingle is
    * md5-hashed ONCE (h31 = h56 mod P31), and the K families are cheap
    * affine rehashes mh(i) = min over shingles of (a_i*h31 + b_i) mod P31.
    * 16x fewer md5 calls than seeded hashing, identical LSH behavior.
    */
  def minhashes(shingles: Column, k: Int): Column = {
    val base = transform(shingles, s => pmod(h56(s), lit(P31)))
    array((0 until k).map { i =>
      aggregate(base, lit(Long.MaxValue),
        (acc, h) => least(acc, (lit(affineA(i)) * h + lit(affineB(i))) % lit(P31)))
    }: _*)
  }

  /** LSH band keys: bands of `rows` consecutive minhash components, encoded
    * as "bandIdx:mh1:mh2" strings (band index in the key prevents
    * cross-band bucket collisions).
    */
  def bandKeys(mh: Column, nBands: Int, rows: Int): Column =
    array((0 until nBands).map { b =>
      concat_ws(":", lit(b) +:
        (0 until rows).map(r => element_at(mh, b * rows + r + 1)): _*)
    }: _*)
}
