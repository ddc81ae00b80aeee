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

  /** First 32 bits of md5 as an unsigned long (0 .. 2^32-1).
    * Backed by the native codegen'd [[graft.expressions.H32]]
    * expression (identical value to
    * `conv(substring(md5(s),1,8),16,10)`, without the hex-string
    * round-trip and without breaking whole-stage codegen). */
  def h32(s: Column): Column = graft.expressions.H32(s)

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

  /** Mersenne prime 2^31-1: modulus for the minhash permutation family
    * (keeps a*h+b inside 63 bits — no overflow in either engine). */
  val MinhashP = 2147483647L

  /** Fixed universal-hash coefficients for the K=12 permutations. */
  val MinhashA: Seq[Long] = Seq(
    1500450271L, 1113426385L, 2038074743L, 1129831, 1676299571L, 507961751L,
    104395301L, 413158511L, 1693951927L, 715225739L, 987654323L, 179424673L)
  val MinhashB: Seq[Long] = Seq(
    12345L, 67891L, 872461L, 1987513L, 55533187L, 99990001L,
    3141593L, 2718281L, 1414213L, 1732051L, 2236067L, 2645751L)

  /** Base shingle hashes for minhash: one md5 per shingle, reduced
    * mod p. The K permutations below are arithmetic — computing K
    * md5s per shingle would cost K× the hashing for no extra
    * independence. */
  def shingleHashes(sh: Column): Column =
    transform(sh, s => h32(s) % MinhashP)

  /** K minhash values from precomputed shingle hashes:
    * minhash_k = min over h of (a_k*h + b_k) mod p. Pass a
    * *materialized column* (select shingleHashes first) so the md5s
    * are evaluated once, not once per permutation. */
  def minhashesFromHashes(hs: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(hs, h => (lit(MinhashA(i)) * h + lit(MinhashB(i))) % MinhashP))): _*)

  /** LSH band signature: md5 over `rows` consecutive minhash values
    * starting at band b (0-based). Docs sharing any band signature are
    * near-dup candidates (standard banding: P(candidate) ≈ 1-(1-j^r)^b). */
  def bandSignature(mh: Column, band: Column, rows: Int): Column =
    md5(concat_ws(",",
      (1 to rows).map(j => element_at(mh, band * rows + j).cast("string")): _*))

  /** Salted per-word hashes. Materialize this as its own projection
    * column before folding bits — referencing the expression inside
    * a per-bit lambda would re-run every md5 32×. */
  def wordHashes(words: Column, salt: Int): Column =
    transform(words, w => h32Salted(lit(salt), w))

  /** 32-bit simhash from per-word hashes: bit b is set iff the sum
    * over words of ±1 (sign of bit b of hash) is positive.
    *
    * Shaped as ONE fold over the hash array that accumulates all 32
    * bit-counters per step — the naive per-bit formulation places the
    * hash-array expression inside the bit lambda, and after Catalyst's
    * CollapseProject inlines the (md5-backed) producer there, every
    * bit re-hashes every word (measured 32× slower). */
  def simhash32FromHashes(hashes: Column): Column = {
    val sums = aggregate(
      hashes,
      array_repeat(lit(0L), lit(32)),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(31)),
          b => when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L)),
        (a, x) => a + x))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(31)),
        (sCnt, b) => when(sCnt > 0, call_function("shiftleft", lit(1L), b)).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two same-width hash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Shared stopword lexicons — ONE definition, because
    * q_quality_filter's no_stopwords verdict and q_text_quality's
    * stop_ratio (and the lang-id scorer) must agree on what counts. */
  val stopEn = Seq("the", "a", "of", "to", "and", "is", "in")
  val stopEs = Seq("el", "la", "de", "que", "y", "los")
  val stopDe = Seq("der", "die", "das", "und", "ist", "ein")

  /** DuckDB list-literal rendering for an oracle's lexicon. */
  def sqlList(xs: Seq[String]): String = xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Stopword hit count against a fixed lexicon. */
  def stopwordCount(words: Column, lexicon: Seq[String]): Column =
    size(filter(words, w => w.isin(lexicon: _*)))

  /** Canonical-form fingerprint: md5 of lowercased,
    * whitespace-collapsed, trimmed text (rolling-hash analog that is
    * cross-engine reproducible). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))
}
