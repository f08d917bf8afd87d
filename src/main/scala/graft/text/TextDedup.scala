package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextPrims._

/** Deduplication operators for LLM-training-data pipelines: exact,
  * MinHash-LSH, exact n-gram Jaccard, and SimHash. All are pure
  * DataFrame→DataFrame transforms over an (id, text) input, built from
  * higher-order functions only (no UDFs), and all are hash-bucketed — never
  * all-pairs over the corpus — so the same plans run at 100 TB:
  *
  *  - exact dedup: one shuffle on the text hash (map-side partial agg);
  *  - MinHash: candidates come from a shuffle on (band, bucket) — only
  *    documents sharing an LSH bucket are ever compared;
  *  - n-gram Jaccard: inverted-index join on the shingle, i.e. a shuffle on
  *    shingle values — pairs materialize only for co-occurring shingles
  *    (at web scale, cap shingle document-frequency to bound skew);
  *  - SimHash: banded on signature halves, so candidate pairs agree on 15
  *    of 30 bits before any comparison.
  *
  * Cache lifetime: these operators persist their compact hash
  * intermediates (load-bearing — see the CollapseProject notes below) and
  * leave them cached for the session, which is right for the
  * one-corpus-per-session batch jobs this engine targets. A long-lived
  * service invoking them per corpus batch should `spark.catalog.clearCache()`
  * (or track and unpersist) between batches, or cached blocks accumulate.
  */
object TextDedup {

  /** Exact dedup keyed by TWO independent polynomial hashes of the
    * normalized text (different seed/multiplier/modulus), a ~2^60 combined
    * key space — one ~2^30 hash alone would falsely merge distinct
    * documents at corpus scale (~n²/2^31 expected collisions ≈ 170 already
    * at 600k docs). Output: one row per distinct normalized text — the
    * kept (minimum) id and the copy count. Never groups on the full text
    * bytes: at 100 TB the shuffle key must be fixed-width hashes, not a
    * document body. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = normText(col(textCol))
    val hash2 = aggregate(split(norm, ""), lit(11L),
      (a, ch) => (a * 37L + ascii(ch)) % 998244353L)
    df.groupBy(charHash(norm).as("text_hash"), hash2.as("text_hash2"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("text_hash", "text_hash2")
  }

  /** Near-duplicate pairs via MinHash + LSH banding, verified with the exact
    * Jaccard on the shingle sets. `numHashes` minhashes in `bands` bands:
    * documents colliding in ≥1 band become candidates; candidates below
    * `minJaccard` are discarded by the exact check, so the only
    * approximation is possible false negatives from banding.
    * Output: (doc_a, doc_b, jaccard), doc_a < doc_b. */
  def minhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
                     minJaccard: Double = 0.8): DataFrame = {
    val r = numHashes / bands
    // persist() is load-bearing, not a cache nicety: without the
    // materialization boundary CollapseProject inlines the shingle-hash
    // array into all 32 minhash expressions (and into both self-join
    // sides), recomputing every hash 32+ times per row. The persisted
    // frames are O(docs × tokens) — the compact signature layer you would
    // deliberately materialize at 100 TB too. Shingle hashes fold k-windows
    // of the stored token hashes (never materializing shingle strings), so
    // signature, candidate join AND exact-Jaccard verification all run on
    // fixed-width longs (same Jaccard modulo hash collisions at P ≈ 2^30;
    // the oracle mirrors the hashed sets, so parity is exact).
    val docs = tokenHashFrame(df, idCol, textCol)
      .select(col("id"),
        hashedShinglesFromTokenHashes(col("th"), shingleK).as("sh_h"))
      .filter(size(col("sh_h")) > 0)
      .persist()
    // banded (id, band, bucket) only — 3 small columns; the shingle sets
    // rejoin for verification instead of riding through the self-join.
    // Persisted so the 32-hash signature is evaluated exactly once per doc.
    val bandsDf = docs
      .withColumn("sig", minhashSig(col("sh_h"), numHashes))
      .select(col("id"),
        explode(array((0 until bands).map(bi =>
          struct(lit(bi).as("band"), bandSig(col("sig"), bi, r).as("bucket"))): _*))
          .as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
      .persist()
    val candidates = bandsDf.as("a").join(bandsDf.as("b"), Seq("band", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    candidates
      .join(docs.select(col("id").as("doc_a"), col("sh_h").as("sh_a")), Seq("doc_a"))
      .join(docs.select(col("id").as("doc_b"), col("sh_h").as("sh_b")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard similarity pairs via an inverted-index join on
    * the shingle (the scalable exact counterpart to [[minhashNearDup]] —
    * candidate pairs materialize only where a shingle co-occurs, never
    * all-pairs). Output: (doc_a, doc_b, jaccard) with jaccard ≥ `minJaccard`.
    *
    * `maxShingleDf` bounds skew: a shingle appearing in more than that many
    * documents ("the end of the" at web scale) contributes O(df²) candidate
    * rows; capping drops it from the INDEX ONLY — intersections lose those
    * common shingles (jaccard becomes a lower bound), which is the standard
    * prefix-filtering trade. Unset (0) = exact, the oracle-checked default.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, minJaccard: Double = 0.8,
                        maxShingleDf: Int = 0): DataFrame = {
    // persisted: the shingle sets feed the exploded index AND two
    // verify-join sides (see the CollapseProject note in minhashNearDup).
    // Hashed shingles: the inverted-index join shuffles fixed-width longs,
    // not n-gram strings — at web scale that is the difference between
    // shuffling hashes and shuffling the corpus.
    val docs = tokenHashFrame(df, idCol, textCol)
      .select(col("id"),
        hashedShinglesFromTokenHashes(col("th"), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    val sizes = docs.select(col("id"), size(col("sh")).as("n"))
    val exAll = docs.select(col("id"), explode(col("sh")).as("g"))
    val ex =
      if (maxShingleDf <= 0) exAll
      else {
        // drop ultra-common shingles from the index before the self-join —
        // one cheap agg on the shingle key, the same shuffle the join needs.
        val rare = exAll.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf).select("g")
        exAll.join(rare, Seq("g"))
      }
    val inter = ex.as("x").join(ex.as("y"), col("x.g") === col("y.g") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.id"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa.n") + col("sb.n") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  private val SimhashBits = 30

  /** The 30 per-bit balance terms over an already-materialized token-hash
    * array column: bit i is set iff the sum over tokens of ±1 (sign of bit
    * i of the token hash) is positive. Token frequency weights naturally
    * (the fold runs over the full token list, not the set). */
  private def simhashFromHashes(th: Column): Column =
    (0 until SimhashBits).map { i =>
      val balance = aggregate(th, lit(0L),
        (s, h) => s + (shiftright(h, i) % 2L) * 2L - 1L)
      when(balance > 0L, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (id, token-hash array), persisted — the 30 per-bit aggregates each
    * traverse this array, so it must be computed once per row, not inlined
    * 30 times (see the CollapseProject note in minhashNearDup). */
  private def tokenHashFrame(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), transform(tokens(col(textCol)), charHash _).as("th"))
      .persist()

  /** Per-document SimHash signatures. Output: (id, simhash). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenHashFrame(df, idCol, textCol)
      .select(col("id"), simhashFromHashes(col("th")).as("simhash"))
      .orderBy("id")

  /** Near-duplicate pairs by SimHash Hamming distance ≤ `maxHamming`,
    * candidate-blocked on 15-bit signature halves (pigeonhole: any pair
    * with ≤1 differing bit shares at least one half, so recall is exact at
    * the default threshold; wider thresholds trade recall for candidate
    * volume — the standard banded-SimHash trade).
    * Output: (doc_a, doc_b, hamming). */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 1): DataFrame = {
    val sigs = tokenHashFrame(df, idCol, textCol)
      .select(col("id"), simhashFromHashes(col("th")).as("sig"))
      // second boundary: sig feeds both band expressions and both join
      // sides — without it the 30-aggregate simhash is inlined into each.
      .persist()
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until 2).map(bi =>
        struct(lit(bi).as("band"), (shiftright(col("sig"), bi * 15) % 32768L).as("bucket"))): _*))
        .as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("band"), col("bucket"), col("id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
