package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable text/hash primitives used by the dedup / similarity /
  * text-analysis operators (the LLM-data-pipeline surface, SURVEY.md §7.1
  * `extra/`).
  *
  * Everything here is built from Spark higher-order functions
  * (`transform`/`aggregate`/`filter`) — no UDFs, no serialization, fully
  * distributed — and every primitive has an exact DuckDB twin in
  * [[graft.OracleSqlDocs]] so results are verified value-for-value by the
  * correctness gate. That forces all arithmetic to stay inside ranges where
  * Spark (Java long / IEEE double) and DuckDB (BIGINT / DOUBLE) agree
  * bit-for-bit:
  *
  *  - hashes are polynomial mod P = 1e9+7, so every intermediate stays
  *    < 2^63 (no overflow wrap, which DuckDB rejects and Java silently does);
  *  - double math is written as explicit left-to-right folds, which IEEE-754
  *    makes bit-identical across engines.
  */
object TextPrims {

  /** Modulus for all polynomial hashing: large prime, keeps a*x+b < 2^63. */
  val P = 1000000007L

  /** Lowercase, trim, collapse whitespace — the canonical form every text
    * operator works on (dedup normalization). */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Deterministic 30-bit string hash: fold (h*31 + codepoint) mod P over
    * the characters, seed 7. Identical in DuckDB via list_reduce.
    * Evaluated by the codegen'd [[PolyHash]] expression — a tight generated
    * loop instead of one interpreted lambda frame per character (this hash
    * runs per shingle/token/gram in every dedup operator's inner loop). */
  def charHash(c: Column): Column = PolyHash(c)

  /** The same hash as a pure higher-order-function expression — kept as the
    * executable specification PolyHash is tested against. */
  def charHashHof(c: Column): Column =
    aggregate(split(c, ""), lit(7L), (a, ch) => (a * 31L + ascii(ch)) % P)

  /** Word k-shingles ("a b c" strings) of a token array; empty array when
    * the document is shorter than k (sequence() would go descending). */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Distinct word k-shingles of a text column — the set the Jaccard /
    * MinHash operators compare. */
  def shingleSet(text: Column, k: Int): Column =
    array_distinct(wordShingles(tokens(text), k))

  /** Distinct HASHED k-shingles from an ALREADY-MATERIALIZED token-hash
    * array column: fold each k-window of token hashes with the same
    * (acc*31 + v) mod P polynomial. Building the joined "a b c" strings
    * was the dominant cost of the dedup pipeline (~2 ms/doc of array_join
    * + per-shingle string hashing); this is O(windows·k) long arithmetic
    * over a stored array. The input MUST come from a persisted frame —
    * passing the raw `transform(tokens, charHash)` expression here would
    * re-hash every token once per window (the CollapseProject trap).
    * Distinct shingles map to distinct hashes modulo P-collisions, so
    * Jaccard/MinHash semantics are unchanged; the DuckDB twin mirrors the
    * same two-level fold. */
  def hashedShinglesFromTokenHashes(th: Column, k: Int): Column =
    array_distinct(
      when(size(th) >= k,
        transform(sequence(lit(1), size(th) - (k - 1)),
          i => aggregate(slice(th, i, lit(k)), lit(7L), (a, v) => (a * 31L + v) % P)))
        .otherwise(array().cast("array<long>")))

  /** MinHash signature of a shingle-hash array: H values
    * min_j((a_j*x + b_j) mod P) with a_j, b_j derived from j (Knuth
    * multiplicative constants) so both engines can generate them inline.
    * Evaluated by the codegen'd [[MinHashSig]] expression (fused j×x
    * loop); [[minhashSigHof]] is the executable spec it must match. */
  def minhashSig(shingleHashes: Column, numHashes: Int): Column =
    MinHashSig(shingleHashes, numHashes)

  /** The signature as pure higher-order functions — the spec twin. */
  def minhashSigHof(shingleHashes: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), j => {
      val jl = j.cast("long")
      val a = (jl * 2L + 1L) * 2654435761L % P
      val b = (jl * 40503L + 17L) % P
      array_min(transform(shingleHashes, x => (a * x + b) % P))
    })

  /** SimHash of a token-hash array: bit i set iff the ±1 balance of bit i
    * over all token hashes is positive. Evaluated by the codegen'd
    * [[SimHashSig]] expression (one pass maintaining all bit counters);
    * [[simhashHof]] is the executable spec it must match. */
  def simhashSig(tokenHashes: Column, bits: Int = 30): Column =
    SimHashSig(tokenHashes, bits)

  /** The SimHash as pure higher-order functions — the spec twin (one
    * interpreted aggregate per bit). */
  def simhashHof(tokenHashes: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val balance = aggregate(tokenHashes, lit(0L),
        (s, h) => s + (shiftright(h, i) % 2L) * 2L - 1L)
      when(balance > 0L, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Fold one LSH band (rows [bandIdx*r+1, bandIdx*r+r] of the signature,
    * 1-based) into a single bucket key. */
  def bandSig(sig: Column, bandIdx: Int, rowsPerBand: Int): Column =
    aggregate(slice(sig, bandIdx * rowsPerBand + 1, rowsPerBand),
      lit(7L), (a, v) => (a * 31L + v) % P)

  /** Second modulus for combined window keys: prime < 2^30, coprime to
    * [[P]], so `w1 * P2 + w2` packs two independent window hashes into one
    * collision-resistant ~2^60 long (max value ≈ 9.98e17 < 2^63 — no
    * overflow on either engine). */
  val P2 = 998244353L

  /** POSITIONAL k-window keys of a token-hash array — [[spanDedup]]'s
    * index: element i (0-based in the array, so array position = token
    * position of the window's first token) is the combined two-hash key of
    * tokens [i, i+k). Unlike [[hashedShinglesFromTokenHashes]] this keeps
    * every occurrence in order (no distinct): span dedup needs positions
    * and repeat counts, not set semantics. Two independent polynomial
    * folds (seed 7/mult 31/mod P and seed 11/mult 37/mod P2) packed as
    * `w1*P2 + w2`: one ~2^30 hash alone would falsely merge distinct
    * spans at corpus scale (the [[graft.text.TextDedup.exactDedup]]
    * birthday-bound argument, at window granularity). Same
    * CollapseProject contract as the shingle fold: `th` MUST come from a
    * materialized (Barrier'd) column. */
  def hashedWindowKeys(th: Column, k: Int): Column =
    WindowKeys(th, k)

  /** The declarative HOF twin of [[WindowKeys]] — kept as the executable
    * spec (WindowKeysSpec pins bit-equality) and as the formulation the
    * DuckDB oracles mirror. Not used on the hot path: the fold lambdas
    * evaluate interpreted (HigherOrderFunction is CodegenFallback), one
    * frame per element per window — ~16 µs/window at the 1M-doc Zipf
    * rung, which made decontamination 72% of the round-16 10M-doc
    * funnel wall before the codegen node replaced it. */
  def hashedWindowKeysHof(th: Column, k: Int): Column =
    when(size(th) >= k,
      transform(sequence(lit(1), size(th) - (k - 1)), i => {
        val w = slice(th, i, lit(k))
        val w1 = aggregate(w, lit(7L), (a, v) => (a * 31L + v) % P)
        val w2 = aggregate(w, lit(11L), (a, v) => (a * 37L + v) % P2)
        w1 * P2 + w2
      }))
      .otherwise(array().cast("array<long>"))

  /** Stopword list shared by text-stats / quality scoring. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Language marker words for the n-gram/stopword lang-id heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "is", "and", "of"),
    "es" -> Seq("el", "la", "que", "de"),
    "fr" -> Seq("le", "les", "une", "est"),
    "de" -> Seq("der", "die", "und", "ist"))
}

/** Deterministic random-hyperplane constants for embedding LSH, shared by
  * the Spark operators and the generated DuckDB oracle so both engines use
  * literally the same plane values (doubles round-trip exactly through
  * Double.toString → SQL literal → parse).
  */
object AnnPrims {
  /** Component d of hyperplane j: pseudo-random in [-0.5, 0.5) from a
    * Knuth-multiplicative sequence — no RNG state, any engine can rebuild. */
  def plane(j: Int, dim: Int = 64): IndexedSeq[Double] =
    (0 until dim).map(d => ((j * dim.toLong + d) * 2654435761L % 1000000007L) / 1e9 - 0.5)

  /** Left-to-right dot product of a float-vector column with plane j —
    * explicit fold so DuckDB reproduces the exact double. `dim` must match
    * the vector length (zip_with null-pads a mismatch, poisoning the dot). */
  def dotPlane(vec: Column, j: Int, dim: Int = 64): Column = {
    import org.apache.spark.sql.functions._
    val p = array(plane(j, dim).map(lit): _*)
    aggregate(zip_with(vec, p, (x, pl) => x.cast("double") * pl),
      lit(0.0), (acc, v) => acc + v)
  }

  /** Sign-bucket of a vector under planes [firstPlane, firstPlane+n): bit j
    * set iff dot(v, plane) > 0. Evaluated by the codegen'd [[SignBucket]]
    * expression — one tight multiply-add loop per plane instead of
    * nPlanes interpreted `aggregate(zip_with(...))` folds per row (the
    * banding cost of every LSH op); [[signBucketHof]] is the spec twin. */
  def signBucket(vec: Column, firstPlane: Int, nPlanes: Int, dim: Int = 64): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SignBucket(org.apache.spark.sql.GraftSqlBridge.expression(vec),
        firstPlane, nPlanes, dim))

  /** The sign-bucket as pure higher-order functions — the spec twin
    * ([[SignBucket]]'s null/length edge semantics replicate this form
    * exactly: a null vector, a length≠dim vector, or any null element
    * yields bucket 0, never null). */
  def signBucketHof(vec: Column, firstPlane: Int, nPlanes: Int, dim: Int = 64): Column = {
    import org.apache.spark.sql.functions._
    (0 until nPlanes).map { j =>
      when(dotPlane(vec, firstPlane + j, dim) > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Left-to-right cosine similarity between two float-vector columns, all
    * arithmetic in double — bit-identical to the DuckDB twin. Evaluated by
    * the codegen'd [[CosineSim]] expression; [[cosineHof]] is the spec. */
  def cosine(a: Column, b: Column): Column = CosineSim(a, b)

  /** The cosine as pure higher-order functions — the spec twin. */
  def cosineHof(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Left-to-right squared L2 distance between two float-vector columns,
    * all arithmetic in double — bit-identical to the DuckDB twin.
    * Evaluated by the codegen'd [[L2Sq]] expression; [[l2sqHof]] is the
    * spec. */
  def l2sq(a: Column, b: Column): Column = L2Sq(a, b)

  /** The squared distance as pure higher-order functions — the spec twin. */
  def l2sqHof(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
  }
}
