package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks for the LLM-data-pipeline operators:
  * tokenization, shingling, portable hashing, minhash, simhash, and
  * text-quality signals. Everything here is a composition of
  * codegen'd Catalyst built-ins (no UDFs): at 100 TB these run inside
  * whole-stage codegen with zero extra shuffles and no JVM⇄Python or
  * serialization seams.
  *
  * Hash convention: `h32(s)` = first 32 bits of md5(s) as an unsigned
  * value in a LongType. md5 is available bit-identically in every
  * engine (the DuckDB oracle uses `('0x'||substr(md5(s),1,8))::BIGINT`)
  * so derived operators (minhash, simhash, fingerprints) are
  * cross-engine checkable — unlike engine-private hash seeds
  * (xxhash64, MLlib's LSH) which are only rows-only checkable.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space delimited corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** First 32 bits of md5 as an unsigned long (0 .. 2^32-1). */
  def h32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Salted variant: independent hash function per integer salt. */
  def h32Salted(salt: Column, s: Column): Column =
    h32(concat(salt.cast("string"), lit(":"), s))

  /** Distinct word n-gram shingles of a token array. Empty when the
    * doc has fewer than n tokens (Spark's sequence(0, negative) would
    * count downward — guard explicitly). */
  def shingles(words: Column, n: Int): Column =
    when(size(words) >= n,
      array_distinct(
        transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** K independent minhash values over a shingle array.
    * minhash_k = min over shingles of h32(k || ':' || shingle). */
  def minhashes(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      kk => array_min(transform(sh, s => h32Salted(kk, s))))

  /** LSH band signature: md5 over `rows` consecutive minhash values
    * starting at band b (0-based). Docs sharing any band signature are
    * near-dup candidates (standard banding: P(candidate) ≈ 1-(1-j^r)^b). */
  def bandSignature(mh: Column, band: Column, rows: Int): Column =
    md5(concat_ws(",",
      (1 to rows).map(j => element_at(mh, band * rows + j).cast("string")): _*))

  /** 32-bit simhash of a token array: bit b is set iff the sum over
    * tokens of ±1 (sign of bit b of h32(token)) is positive. */
  def simhash32(words: Column, salt: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(31)),
        b => when(
          aggregate(words, lit(0L),
            (acc, w) => acc
              + when(call_function("shiftright", h32Salted(lit(salt), w), b)
                  .bitwiseAND(1) === 1, 1L)
                .otherwise(-1L)) > 0,
          call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Hamming distance between two same-width hash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Stopword hit count against a fixed lexicon. */
  def stopwordCount(words: Column, lexicon: Seq[String]): Column =
    size(filter(words, w => w.isin(lexicon: _*)))

  /** Canonical-form fingerprint: md5 of lowercased,
    * whitespace-collapsed, trimmed text (rolling-hash analog that is
    * cross-engine reproducible). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))
}
