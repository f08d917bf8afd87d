package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Barrier
import graft.functions.TextPrims._

/** Per-document text analysis for LLM-data pipelines: quality stats,
  * language identification, and content fingerprinting. Pure narrow
  * projections — no shuffle and no cache at all, each document is scored
  * independently, so throughput scales linearly with executors at any
  * corpus size. Intermediates that several output expressions reference
  * (token arrays, per-language hit counts, gram-hash arrays) are computed
  * exactly once per row behind a [[graft.functions.Barrier]] — without it
  * CollapseProject inlines them into every reference (the argmax chain in
  * [[langId]] alone would re-tokenize and re-scan the document ~15×). */
object TextStats {

  /** (id, norm, t): normalized text and its token array, each computed
    * once per row. */
  private def tokenFrame(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = Barrier.once(
      df.select(col(idCol).as("id"), col(textCol).as("__t")), Seq("id"),
      "norm" -> normText(col("__t")))
    Barrier.once(n, Seq("id", "norm"), "t" -> split(col("norm"), " "))
  }

  /** Length / token / stopword statistics and a deterministic quality
    * score. All double math is a fixed left-to-right expression so the
    * DuckDB oracle reproduces it bit-for-bit. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counters = Barrier.once(tokenFrame(df, idCol, textCol), Seq("id"),
      "n_chars" -> length(col("norm")).cast("long"),
      "n_tokens" -> size(col("t")).cast("long"),
      "n_unique_tokens" -> size(array_distinct(col("t"))).cast("long"),
      "len_sum" -> aggregate(col("t"), lit(0L), (a, t) => a + length(t)),
      "stop_hits" -> size(filter(col("t"), t => t.isin(Stopwords: _*))).cast("long"))
    val stopRatio = col("stop_hits").cast("double") / col("n_tokens")
    counters.select(
      col("id"), col("n_chars"), col("n_tokens"), col("n_unique_tokens"),
      (col("len_sum").cast("double") / col("n_tokens")).as("avg_token_len"),
      stopRatio.as("stopword_ratio"),
      // crude quality proxy: enough tokens, not stopword-soup.
      (least(lit(1.0), col("n_tokens").cast("double") / 200.0) * (lit(1.0) - stopRatio))
        .as("quality_score"))
      .orderBy("id")
  }

  /** Gopher repetition signals (Rae et al. 2021 §A1.1) per document:
    * duplicate-line fractions over the raw text, most-frequent 2/3-gram
    * character coverage and duplicated 5-gram fraction over the
    * house-normalized tokens — one fused row-local expression
    * ([[graft.functions.RepetitionStats]]), zero shuffle, so throughput
    * is linear in executors at any corpus scale. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null text ≡ empty text (the lineFrame convention) — without the
    // coalesce, Spark's null-in-null-out struct would diverge from the
    // DuckDB twin's coalesced zeros on a null-text row
    val withNorm = Barrier.once(
      df.select(col(idCol).as("id"),
        coalesce(col(textCol), lit("")).as("__t")), Seq("id", "__t"),
      "norm" -> normText(col("__t")))
    Barrier.once(withNorm, Seq("id"),
      "r" -> graft.functions.RepetitionStats(col("__t"), col("norm")))
      .select(col("id"), col("r.*"))
      .orderBy("id")
  }

  /** The Gopher repetition-removal RULES (Rae et al. 2021 Table A1)
    * applied to [[repetitionSignals]]: per-document threshold flags and
    * the keep verdict. Thresholds are the published ones (dup-line 0.30,
    * dup-line-chars 0.20, top-2-gram 0.20, top-3-gram 0.18, dup-5-gram
    * 0.15) — with the documented deviation that the 5-gram signal here
    * is the duplicated-OCCURRENCE fraction, not Gopher's duplicated-char
    * fraction (overlap-deduped char coverage is not a row-local
    * integer contract). Flags are kept per rule so a curation report
    * can attribute removals. */
  def gopherRepetitionFilter(df: DataFrame, idCol: String, textCol: String): DataFrame =
    repetitionSignals(df, idCol, textCol).select(
      col("id"),
      (col("dup_line_frac") > 0.30).as("bad_dup_lines"),
      (col("dup_line_char_frac") > 0.20).as("bad_dup_line_chars"),
      (col("top_2gram_char_frac") > 0.20).as("bad_top_2gram"),
      (col("top_3gram_char_frac") > 0.18).as("bad_top_3gram"),
      (col("dup_5gram_frac") > 0.15).as("bad_dup_5grams"))
      .withColumn("kept", !(col("bad_dup_lines") || col("bad_dup_line_chars") ||
        col("bad_top_2gram") || col("bad_top_3gram") || col("bad_dup_5grams")))
      .orderBy("id")

  /** Gopher stopword-presence set (Rae et al. 2021 Table A1): a doc must
    * contain at least two DISTINCT members to pass the stopword rule. */
  private val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher QUALITY rules (Rae et al. 2021 Table A1, the
    * non-repetition half): per-document measures and threshold flags —
    * word-count bounds [50, 100k], mean word length [3, 10], ≥80%
    * alphabetic words, symbol-to-word ratios ≤0.1 EACH for '#' and
    * '...' (per the published rule, two separate ratios — not one
    * combined count), ≥2 distinct core stopwords, ≤90% bullet-started
    * lines, ≤30% ellipsis-ended lines. Entirely declarative (built-in
    * HOFs over the token array and the raw lines — no custom expression
    * needed): a narrow zero-shuffle projection, with every fraction one
    * integer-to-integer double division so the DuckDB twin hash-matches.
    * Lines follow the p131 contract (split raw on `\n`, U+0020-trim,
    * drop blanks). Null text ≡ empty text (the lineFrame convention). */
  def gopherQualityRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = Barrier.once(
      df.select(col(idCol).as("id"),
        coalesce(col(textCol), lit("")).as("__t")), Seq("id", "__t"),
      "norm" -> normText(col("__t")))
    val withArrays = Barrier.once(base, Seq("id", "norm"),
      "t" -> split(col("norm"), " "),
      "ls" -> filter(transform(split(col("__t"), "\n"), l => trim(l)),
        l => l =!= ""))
    val counted = Barrier.once(withArrays, Seq("id"),
      "word_count" -> size(col("t")).cast("long"),
      "len_sum" -> aggregate(col("t"), lit(0L), (a, w) => a + length(w)),
      "n_alpha_words" -> size(filter(col("t"), w => w.rlike("[a-z]"))).cast("long"),
      "n_hash" -> size(regexp_extract_all(col("norm"), lit("#"), lit(0))).cast("long"),
      "n_ellipsis" -> size(regexp_extract_all(col("norm"), lit("\\.\\.\\."), lit(0))).cast("long"),
      "n_stops" -> size(array_intersect(array_distinct(col("t")),
        array(GopherStops.map(lit): _*))).cast("long"),
      "n_lines" -> size(col("ls")).cast("long"),
      "n_bullet_lines" -> size(filter(col("ls"),
        l => l.startsWith("• ") || l.startsWith("- "))).cast("long"),
      "n_ellipsis_lines" -> size(filter(col("ls"),
        l => l.endsWith("..."))).cast("long"))
    val meanLen = col("len_sum").cast("double") / col("word_count").cast("double")
    val alphaFrac = col("n_alpha_words").cast("double") / col("word_count").cast("double")
    val hashRatio = col("n_hash").cast("double") / col("word_count").cast("double")
    val ellipsisRatio = col("n_ellipsis").cast("double") / col("word_count").cast("double")
    val bulletFrac = when(col("n_lines") === 0L, 0.0)
      .otherwise(col("n_bullet_lines").cast("double") / col("n_lines").cast("double"))
    val ellipsisFrac = when(col("n_lines") === 0L, 0.0)
      .otherwise(col("n_ellipsis_lines").cast("double") / col("n_lines").cast("double"))
    counted.select(
      col("id"), col("word_count"),
      meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_word_frac"),
      hashRatio.as("hash_word_ratio"),
      ellipsisRatio.as("ellipsis_word_ratio"),
      col("n_stops").as("n_distinct_stopwords"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      (col("word_count") < 50L || col("word_count") > 100000L).as("bad_word_count"),
      (meanLen < 3.0 || meanLen > 10.0).as("bad_mean_word_len"),
      (alphaFrac < 0.80).as("bad_alpha_words"),
      (hashRatio > 0.10 || ellipsisRatio > 0.10).as("bad_symbol_ratio"),
      (col("n_stops") < 2L).as("bad_stopwords"),
      (bulletFrac > 0.90).as("bad_bullets"),
      (ellipsisFrac > 0.30).as("bad_ellipsis"))
      .withColumn("kept", !(col("bad_word_count") || col("bad_mean_word_len") ||
        col("bad_alpha_words") || col("bad_symbol_ratio") ||
        col("bad_stopwords") || col("bad_bullets") || col("bad_ellipsis")))
      .orderBy("id")
  }

  private val QualityRuleCols = Seq("bad_word_count", "bad_mean_word_len",
    "bad_alpha_words", "bad_symbol_ratio", "bad_stopwords", "bad_bullets",
    "bad_ellipsis", "kept")
  private val RepetitionRuleCols = Seq("bad_dup_lines", "bad_dup_line_chars",
    "bad_top_2gram", "bad_top_3gram", "bad_dup_5grams", "kept")

  /** Corpus-level curation report: per-rule flagged counts and fractions
    * over the [[gopherQualityRules]] and [[gopherRepetitionFilter]]
    * verdict frames — the removal-attribution table a curation run
    * publishes next to its output. Each family is ONE narrow aggregate
    * (map-side partial sums of 0/1 casts, a single row crossing the
    * exchange) melted into rows, so the report costs two corpus passes
    * and shuffles ~nothing at any scale. */
  def curationReport(qualFlags: DataFrame, repFlags: DataFrame): DataFrame = {
    def rollup(df: DataFrame, family: String, rules: Seq[String]): DataFrame = {
      val agg = df.agg(count(lit(1)).as("n_docs"),
        rules.map(rc => sum(col(rc).cast("long")).as(rc)): _*)
      agg.select(explode(array(rules.map(rc =>
          struct(lit(family).as("family"), lit(rc).as("rule"),
            col(rc).as("n_flagged"), col("n_docs").as("n_docs"))): _*)).as("x"))
        .select(col("x.family").as("family"), col("x.rule").as("rule"),
          col("x.n_flagged").as("n_flagged"), col("x.n_docs").as("n_docs"),
          (col("x.n_flagged").cast("double") / col("x.n_docs").cast("double"))
            .as("frac"))
    }
    rollup(qualFlags, "quality", QualityRuleCols)
      .union(rollup(repFlags, "repetition", RepetitionRuleCols))
      .orderBy("family", "rule")
  }

  /** Marker-word language heuristic: count hits against per-language
    * stopword lists, pick the max with a fixed precedence (en, es, fr, de),
    * `und` (undetermined) when nothing matches. A real pipeline would use
    * character n-gram profiles; the operator shape (narrow projection,
    * deterministic argmax) is the same. The four hit counts are computed
    * once per row; the argmax chain above references the stored longs. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hitCols: Seq[(String, Column)] = LangMarkers.map { case (lang, markers) =>
      s"${lang}_hits" -> size(filter(col("t"), t => t.isin(markers: _*))).cast("long")
    }
    val hits = Barrier.once(tokenFrame(df, idCol, textCol), Seq("id"), hitCols: _*)
    val Seq(en, es, fr, de) = Seq("en", "es", "fr", "de").map(l => col(s"${l}_hits"))
    hits.select(
      col("id"),
      en.as("en_hits"), es.as("es_hits"), fr.as("fr_hits"), de.as("de_hits"),
      when(en + es + fr + de === 0L, "und")
        .when(en >= es && en >= fr && en >= de, "en")
        .when(es >= fr && es >= de, "es")
        .when(fr >= de, "fr")
        .otherwise("de").as("predicted_lang"))
      .orderBy("id")
  }

  /** BPE-ish segmentation pattern: letter runs, digit runs, single
    * non-alphanumeric marks — the GPT-2-style pre-tokenizer shape reduced
    * to character classes both Java regex (Spark) and RE2 (DuckDB) segment
    * identically (disjoint alternatives, no backtracking ambiguity). */
  private val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Token counting for budget estimation: whitespace tokens plus the
    * BPE-ish regex segmentation and its class breakdown. Narrow, one pass,
    * the normalized text computed once behind the barrier. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Barrier.once(
      df.select(col(idCol).as("id"), col(textCol).as("__t")), Seq("id"),
      "norm" -> normText(col("__t")))
      .select(
        col("id"),
        size(split(col("norm"), " ")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("norm"), lit(BpePattern), lit(0)))
          .cast("long").as("n_bpe_tokens"),
        size(regexp_extract_all(col("norm"), lit("[a-z]+"), lit(0)))
          .cast("long").as("n_word_tokens"),
        size(regexp_extract_all(col("norm"), lit("[0-9]+"), lit(0)))
          .cast("long").as("n_num_tokens"),
        size(regexp_extract_all(col("norm"), lit("[^a-z0-9 ]"), lit(0)))
          .cast("long").as("n_punct_tokens"))
      .orderBy("id")

  /** Content fingerprint: whole-text polynomial hash plus the min/max of a
    * rolling 8-char-gram hash family (the winnowing building block — the
    * min-gram hash is stable under small edits, unlike the content hash).
    * Documents shorter than 8 normalized chars get null gram stats.
    * The gram pass is the fused codegen'd [[graft.functions.GramStats]] —
    * one loop over the code points, no per-window substring, no gram array
    * ([[fingerprintGramHashesHof]] is the executable spec it is pinned to). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withNorm = Barrier.once(
      df.select(col(idCol).as("id"), col(textCol).as("__t")), Seq("id"),
      "norm" -> normText(col("__t")))
    Barrier.once(withNorm, Seq("id"),
        "content_hash" -> charHash(col("norm")),
        "gs" -> graft.functions.GramStats(col("norm"), 8))
      .select(
        col("id"), col("content_hash"),
        col("gs.min_gram_hash").as("min_gram_hash"),
        col("gs.max_gram_hash").as("max_gram_hash"),
        col("gs.n_grams").as("n_grams"))
      // the global sort's range-partitioner sampling pass would re-execute
      // the fingerprint compute; this shuffle of five fixed-width columns
      // materializes it once and both sort jobs read the map files.
      .repartition(col("id"))
      .orderBy("id")
  }

  /** The gram-hash family as pure higher-order functions — the spec twin
    * [[graft.functions.GramStats]] must match (and the form the DuckDB
    * oracle mirrors): hash every 8-char substring window of the named
    * column. substr with a column position is SQL-only, hence expr(). */
  def fingerprintGramHashesHof(normCol: String): Column =
    transform(
      when(length(col(normCol)) >= 8,
        expr(s"transform(sequence(1, length($normCol) - 7), i -> substr($normCol, i, 8))"))
        .otherwise(array().cast("array<string>")),
      charHash _)

  /** Statistical novelty scoring against a corpus-trained bigram model —
    * the CCNet-perplexity archetype (score every document by how typical
    * its n-grams are of a reference corpus; filter or bucket on the
    * score), made engine-portable: log-probability needs `ln`, which IEEE
    * 754 does NOT require correctly rounded (Spark/Java and DuckDB may
    * differ in the last ulp, failing the value-exact gate), so the score
    * is the transcendental-free pair (avg bigram training-frequency,
    * out-of-vocabulary rate) — counts, one sum, one exact division.
    * Training split: documents with pmod(id, holdoutMod) ≠ 0 (ids are
    * assumed non-negative; the oracle mirrors with `%`); EVERY document
    * is scored, so the holdout rows show what unseen text scores.
    * Output: (doc_id, n_bigrams, n_oov, support_sum, avg_support,
    * oov_rate) — avg/rate null when a document has no bigrams.
    *
    * Scale shape: bigram occurrences shuffle once as fixed-width
    * (key, id) pairs through ONE explicit exchange that BOTH consumers —
    * the train-count aggregate and the per-document scoring join — read
    * via exchange reuse. The train filter is folded into the aggregate as
    * a conditional sum rather than a WHERE: a filter would push below the
    * exchange on one branch only and split the canonical plans (the
    * spanDedup/ngramJaccardCounting lesson). Hot bigrams ("of the" at web
    * scale) skew the join's probe side; that join is exactly the shape
    * AQE's skew-join splitting rebalances at runtime. The id branch of
    * the final left join prunes to a doc_id-only scan — documents with
    * fewer than two tokens re-enter with zero counts. */
  def bigramNovelty(df: DataFrame, idCol: String, textCol: String,
                    holdoutMod: Int = 10): DataFrame = {
    val ex = bigramOccurrences(df, idCol, textCol).repartition(col("bg"))
    val c2 = ex.groupBy("bg").agg(
      sum(when(pmod(col("id"), lit(holdoutMod)) =!= 0, 1L).otherwise(0L)).as("c2"))
    scoreFrame(df, idCol, ex, c2)
  }

  /** (id, bg) bigram-key occurrence rows — the k=2 instance of the packed
    * two-hash window key (same primitive as spanDedup's index — one tested
    * fold, two operators). Null ids/texts carry nothing, as in the dedup
    * family. */
  private def bigramOccurrences(df: DataFrame, idCol: String,
                                textCol: String): DataFrame = {
    val th = Barrier.once(tokenFrame(df, idCol, textCol), Seq("id"),
      "th" -> transform(col("t"), charHash _))
    val bg = Barrier.once(th, Seq("id"), "bg" -> hashedWindowKeys(col("th"), 2))
    bg.select(col("id").cast("long").as("id"), explode(col("bg")).as("bg"))
      .filter(col("bg").isNotNull && col("id").isNotNull)
  }

  /** The scoring join + per-document rollup shared by the fused query and
    * the model/score split. `ex` must be the occurrence rows of exactly
    * the documents in `df`; `c2` is (bg, c2) with a row per occurring
    * key (0 = never seen in training). The join is LEFT so a score-side
    * bigram the model never saw (possible in the split API, impossible in
    * the fused query) counts as OOV rather than dropping. */
  private def scoreFrame(df: DataFrame, idCol: String,
                         ex: DataFrame, c2: DataFrame): DataFrame = {
    val perDoc = ex.join(c2, Seq("bg"), "left")
      .select(col("id"), coalesce(col("c2"), lit(0L)).as("c2"))
      .groupBy("id").agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("c2") === 0L, 1L).otherwise(0L)).as("n_oov"),
        sum(col("c2")).as("support_sum"))
    df.select(col(idCol).cast("long").as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("support_sum"), lit(0L)).as("support_sum"),
        when(col("n_bigrams").isNotNull,
          col("support_sum").cast("double") / col("n_bigrams")).as("avg_support"),
        when(col("n_bigrams").isNotNull,
          col("n_oov").cast("double") / col("n_bigrams")).as("oov_rate"))
      .orderBy("doc_id")
  }

  /** The bigram model as a standalone table: occurrence counts over ALL
    * of `df` (the caller picks the training corpus — the train/score
    * split a production pipeline runs: train once offline against a
    * reference corpus, score any number of corpora or stream batches
    * against the frozen table). `bigramNovelty` ≡
    * `bigramScore(df, …, bigramModel(trainSplit))` — spec-pinned. */
  def bigramModel(df: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramOccurrences(df, idCol, textCol)
      .groupBy("bg").agg(count(lit(1)).as("c2"))

  /** Score `df` against a frozen [[bigramModel]] table. Bigrams absent
    * from the model count as OOV with zero support. */
  def bigramScore(df: DataFrame, idCol: String, textCol: String,
                  model: DataFrame): DataFrame =
    scoreFrame(df, idCol, bigramOccurrences(df, idCol, textCol), model)

  /** Hashed bag-of-words document embedding (the feature-hashing /
    * signed-random-projection construction of Weinberger et al. 2009):
    * token occurrence → bucket j = charHash mod `dim`, sign ± from a
    * second hash parity; e_j = Σ signs — INTEGER sums cast exactly to
    * float (|e_j| ≤ corpus tokens ≪ 2^24), so the vector build is
    * oracle-exact end-to-end and the resulting frame plugs straight
    * into the [[graft.ann.Similarity]] family (cosine of integer-valued
    * floats is the same portable double fold as every other embedding).
    * This closes the text → vector → ANN loop without a model: exact
    * duplicate documents get identical vectors (cosine 1), near-
    * duplicates land within a high-cosine ball.
    *
    * Scale shape: one narrow tokenize pass, a partial-aggregable
    * (id, j) sum (≤ dim fixed-width rows per doc ride the exchange),
    * then a row-local dense-assembly transform — never a per-doc
    * dim-wide shuffle payload before aggregation. Output:
    * (vec_id, e float[dim]). */
  def hashedEmbedding(df: DataFrame, idCol: String, textCol: String,
                      dim: Int = 64): DataFrame = {
    val toks = df.select(col(idCol).cast("long").as("id"),
      explode(tokens(col(textCol))).as("tok"))
    val hashed = toks.select(col("id"), charHash(col("tok")).as("h"))
    val ex = hashed.select(col("id"),
      pmod(col("h"), lit(dim.toLong)).as("j"),
      when((col("h") * lit(48271L)) % lit(998244353L) % 2L === 0L, 1L)
        .otherwise(-1L).as("s"))
    denseAssemble(ex.groupBy("id", "j").agg(sum(col("s")).as("v")), dim)
  }

  /** IDF-weighted [[hashedEmbedding]]: each occurrence contributes
    * sign × idf(token) with the LOG2-QUANTIZED integer idf
    * `1 + ⌊log2(N / df)⌋` (= `length(bin(N div df))` on both engines —
    * the HLL rank's bitlength trick) — ubiquitous tokens carry weight 1,
    * rare tokens up to ~log2(N): the standard tf-idf down-weighting of
    * stop-token mass that dominates unweighted BoW cosines, kept INTEGER
    * so the vector build stays oracle-exact end-to-end (a float ln()
    * is not bit-portable across engines). bench_records/r14_idf_embed.md
    * quotes the near-dup precision delta vs the unweighted bootstrap.
    *
    * Scale shape: the extra cost over the unweighted build is one
    * distinct (id, token) pass → per-token df aggregate, and a
    * token-keyed join of the occurrence frame against that vocabulary
    * frame (AQE broadcasts it when it fits; at web scale it shuffles on
    * the token key with no skew beyond token frequency itself). The
    * (id, j) partial-sum exchange and dense assembly are unchanged. */
  def hashedEmbeddingIdf(df: DataFrame, idCol: String, textCol: String,
                         dim: Int = 64): DataFrame =
    hashedEmbeddingIdfWith(df, idCol, textCol,
      idfVocabulary(df, idCol, textCol), df.count(), dim)

  /** The frozen idf VOCABULARY (token, dfq): per-token document
    * frequency over the training corpus — the model half of the
    * train/score split ([[bigramModel]]'s convention): build once
    * offline, then [[hashedEmbeddingIdfWith]] embeds any corpus or
    * stream batch against the frozen table. */
  def idfVocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        explode(tokens(col(textCol))).as("tok"))
      .select("id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("dfq"))

  /** Embed against a FROZEN [[idfVocabulary]] and document count —
    * tokens absent from the vocabulary score df = 1 (the rarest weight:
    * an unseen token is maximally informative). Row-local given the
    * vocabulary join; this is the form the streaming twin runs per
    * micro-batch. */
  def hashedEmbeddingIdfWith(df: DataFrame, idCol: String, textCol: String,
                             vocab: DataFrame, nDocs: Long,
                             dim: Int = 64): DataFrame = {
    val toks = df.select(col(idCol).cast("long").as("id"),
      explode(tokens(col(textCol))).as("tok"))
    val weighted = toks.join(vocab, Seq("tok"), "left")
      .select(col("id"), charHash(col("tok")).as("h"),
        length(bin(expr(s"$nDocs div coalesce(dfq, 1L)"))).cast("long").as("w"))
    val ex = weighted.select(col("id"),
      pmod(col("h"), lit(dim.toLong)).as("j"),
      (when((col("h") * lit(48271L)) % lit(998244353L) % 2L === 0L, 1L)
        .otherwise(-1L) * col("w")).as("s"))
    denseAssemble(ex.groupBy("id", "j").agg(sum(col("s")).as("v")), dim)
  }

  /** Shared dense-assembly tail of the hashed-embedding builders: the
    * (id, j, v) sparse sums → (vec_id, e float[dim]), row-local. */
  private def denseAssemble(sums: DataFrame, dim: Int): DataFrame =
    sums.groupBy("id")
      .agg(collect_list(struct(col("j"), col("v"))).as("entries"))
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0L), lit(dim - 1L)), jj =>
          coalesce(
            get(filter(col("entries"), e => e.getField("j") === jj), lit(0))
              .getField("v"),
            lit(0L)).cast("float")).as("e"))

  // ---------------------------------------------------------------------
  // Conditional-bigram LM surprisal + CCNet perplexity buckets
  // ---------------------------------------------------------------------

  /** Hashed-vocabulary size of the conditional LM: token → bucket
    * charHash mod B, bigram key → b1·B + b2 (exact packing, B² < 2^63).
    * B is also the Laplace denominator (the smoothed next-token
    * vocabulary), so the model table is bounded at B² rows and the
    * context table at B rows no matter the corpus size. */
  val LmBuckets = 4096L

  /** Head/middle/tail cut points (CCNet's tertiles). Printed into the
    * oracle SQL from these very doubles, so both engines compute
    * ceil(q·n) on identical bits. */
  val TertileQs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3)

  /** The p162 gate quantile — shared with the DuckDB twin (the oracle
    * interpolates this same double), so the two cannot drift. */
  val QualityGateQ: Double = 0.5

  /** (id, bg) conditional-bigram occurrence rows: consecutive
    * bucket-hash pairs packed as b1·[[LmBuckets]] + b2. The context
    * bucket is recoverable as bg div B — one column carries both
    * factorizations, so the score join needs no second occurrence
    * exchange. Null ids/texts carry nothing (the dedup-family
    * convention). */
  private def lmOccurrences(df: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val bs = Barrier.once(tokenFrame(df, idCol, textCol), Seq("id"),
      "bs" -> transform(col("t"), tok => pmod(charHash(tok), lit(LmBuckets))))
    val prs = Barrier.once(bs, Seq("id"),
      "bgs" -> when(size(col("bs")) >= 2,
        zip_with(
          slice(col("bs"), lit(1), size(col("bs")) - 1),
          slice(col("bs"), lit(2), size(col("bs")) - 1),
          (a, b) => a * lit(LmBuckets) + b))
        .otherwise(array().cast("array<long>")))
    prs.select(col("id").cast("long").as("id"), explode(col("bgs")).as("bg"))
      .filter(col("id").isNotNull)
  }

  /** The frozen LM as ONE table: (bg, c12) bigram occurrence counts over
    * ALL of `df` (the caller picks the training corpus). Context counts
    * need no second table — c1(w1) = Σ c12 over bg div B = w1, because
    * every context occurrence IS a bigram occurrence — so the streaming
    * twin freezes a single artifact. ≤ [[LmBuckets]]² rows by
    * construction. */
  def lmModel(df: DataFrame, idCol: String, textCol: String): DataFrame =
    lmOccurrences(df, idCol, textCol)
      .groupBy("bg").agg(count(lit(1)).as("c12"))

  /** Shared scoring tail: per-occurrence integer bit-surprisal
    * s = ⌊log2((c1 + B)/(c12 + 1))⌋ — the Laplace-smoothed conditional
    * surprisal of w2 given w1, quantized to whole bits so it is EXACT on
    * both engines: the quotient is one integer division (c12 ≤ c1 by
    * construction, so it is ≥ 1) and ⌊log2 n⌋ = length(bin(n)) − 1, no
    * transcendental anywhere (the p126 idf-quantization trick applied to
    * a conditional LM). Per-document rollup: n_bigrams, total_bits
    * (exact longs) and bits_per_bigram = ONE correctly-rounded double
    * division — the transcendental-free stand-in for log2-perplexity.
    *
    * Scale shape: the c12 join is keyed by bg on the (repartitioned)
    * occurrence exchange; the derived c1 table is ≤ B rows and
    * BROADCAST; the rollup partial-aggregates per document before the id
    * exchange. No window, no unbounded collect. */
  private def lmPerDoc(df: DataFrame, idCol: String, ex: DataFrame,
                       model: DataFrame): DataFrame = {
    val c1 = model.groupBy(expr(s"bg div $LmBuckets").as("w1"))
      .agg(sum("c12").as("c1"))
    val bits = ex
      .join(model, Seq("bg"), "left")
      .withColumn("w1", expr(s"bg div $LmBuckets"))
      .join(broadcast(c1), Seq("w1"), "left")
      .withColumn("__c12", coalesce(col("c12"), lit(0L)))
      .withColumn("__c1", coalesce(col("c1"), lit(0L)))
      .select(col("id"),
        (length(bin(expr(s"(__c1 + $LmBuckets) div (__c12 + 1L)"))) - 1)
          .cast("long").as("bits"))
    val perDoc = bits.groupBy("id").agg(
      count(lit(1)).as("n_bigrams"),
      sum("bits").as("total_bits"))
    df.select(col(idCol).cast("long").as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("total_bits"), lit(0L)).as("total_bits"),
        when(col("n_bigrams").isNotNull,
          col("total_bits").cast("double") / col("n_bigrams"))
          .as("bits_per_bigram"))
  }

  /** Fused train+score (the p138 query): conditional-bigram counts over
    * the pmod(id, holdoutMod) ≠ 0 split (conditional sums, not a WHERE —
    * the p88 canonical-plan lesson), every document scored. The CCNet
    * archetype (Wenzek et al. 2020 §4.3): a reference LM's per-token
    * surprisal as the curation signal — here the LM is the corpus's own
    * train split and surprisal is quantized to whole bits so the oracle
    * verifies it exactly. ≡ `lmScore(df, …, lmModel(trainSplit))`
    * (spec-pinned). Output: (doc_id, n_bigrams, total_bits,
    * bits_per_bigram) by doc_id. */
  def lmSurprisal(df: DataFrame, idCol: String, textCol: String,
                  holdoutMod: Int = 10): DataFrame =
    lmSurprisalRaw(df, idCol, textCol, holdoutMod).orderBy("doc_id")

  private def lmSurprisalRaw(df: DataFrame, idCol: String, textCol: String,
                             holdoutMod: Int): DataFrame = {
    val ex = lmOccurrences(df, idCol, textCol).repartition(col("bg"))
    val model = ex.groupBy("bg").agg(
      sum(when(pmod(col("id"), lit(holdoutMod.toLong)) =!= 0L, 1L)
        .otherwise(0L)).as("c12"))
    lmPerDoc(df, idCol, ex, model)
  }

  /** Score `df` against a frozen [[lmModel]] table (the production
    * train-once / score-many split and the streaming twin's path).
    * Bigrams absent from the model score at the OOV ceiling
    * ⌊log2(B/1)⌋ = 12 bits — the natural Laplace value for an unseen
    * event. */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
              model: DataFrame): DataFrame =
    lmPerDoc(df, idCol, lmOccurrences(df, idCol, textCol), model)
      .orderBy("doc_id")

  /** CCNet head/middle/tail perplexity buckets (the p139 query): every
    * document labeled by where its [[lmSurprisal]] bits-per-bigram falls
    * against its OWN LANGUAGE's tertiles — the per-language thresholds
    * of Wenzek et al. §4.3 (head = most reference-like). Tertiles are
    * EXACT per-language order statistics at ascending rank ceil(q·n) via
    * [[graft.ops.Percentiles.exactRankSelect]] (bucketed rank selection
    * — never a per-language global sort), then one ≤C-row broadcast back
    * onto the scored frame. Documents with no bigrams bucket as 'none'.
    * Output: (doc_id, lang, n_bigrams, bits_per_bigram, ppl_bucket) by
    * doc_id. */
  def surprisalBuckets(df: DataFrame, idCol: String, textCol: String,
                       langCol: String, holdoutMod: Int = 10): DataFrame = {
    val scored = lmSurprisalRaw(df, idCol, textCol, holdoutMod)
    val langs = df.select(col(idCol).cast("long").as("doc_id"),
      col(langCol).as("lang"))
    // localCheckpoint: four consumers read this frame (the rank-select
    // bounds collect, its histogram and target-bin branches, and the
    // final bucket join), and each would otherwise re-run the whole
    // LM train+score pipeline — the bigram exchange 4×. The frame is
    // one fixed-width row per document (never occurrence-sized), so
    // materializing it is the cheap side of that trade at any scale.
    val base = scored.join(langs, Seq("doc_id")).localCheckpoint()
    val thr = graft.ops.Percentiles.exactRankSelect(
        base.filter(col("n_bigrams") > 0L)
          .select(col("lang"), col("bits_per_bigram")),
        "lang", "bits_per_bigram", TertileQs)
      .groupBy("lang").agg(
        max(when(col("q") === TertileQs(0), col("bits_per_bigram")))
          .as("__t1"),
        max(when(col("q") === TertileQs(1), col("bits_per_bigram")))
          .as("__t2"))
    base.join(broadcast(thr), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("bits_per_bigram"),
        when(col("n_bigrams") === 0L, lit("none"))
          .when(col("bits_per_bigram") <= col("__t1"), lit("head"))
          .when(col("bits_per_bigram") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
      .orderBy("doc_id")
  }

  /** Language-stratified quality gate (the CCNet/FineWeb-style filter
    * stage: one GLOBAL quality threshold over-filters languages whose
    * score distribution sits lower, so the cut is per-LANGUAGE): each
    * document's [[stats]] quality score against its language's exact
    * `q`-quantile, keep iff score ≥ threshold. The threshold is the
    * lower discrete quantile (an actual corpus value, rank
    * max(1, ⌈q·n⌉)), so ties keep slightly more than the nominal share —
    * the [[graft.ops.Percentiles.exactRankSelect]] contract.
    *
    * Scale shape: scoring is row-local; thresholds ride the BUCKETED
    * rank select (never a per-language global sort — the p139 shape on
    * the quality axis) and broadcast back as ≤C rows. Null-quality
    * documents (null text) are excluded from threshold estimation and
    * carry a null verdict. Output: (doc_id, lang, quality_score,
    * lang_threshold, keep) by doc_id. */
  def langQualityGate(df: DataFrame, idCol: String, textCol: String,
                      langCol: String, dropQ: Double = QualityGateQ): DataFrame = {
    // localCheckpoint: the threshold estimation (rank-select bounds
    // collect + histogram + target-bin join) and the final gate would
    // otherwise each re-run the stats() scoring pass — four tokenize
    // scans of the corpus for one row-local score per document. The
    // scored frame is one fixed-width row per document, so materializing
    // it once is the cheap side at any scale (the surprisalBuckets
    // pattern).
    val scored = gateScored(df, idCol, textCol, langCol).localCheckpoint()
    gateFromScored(scored, thresholdsFromScored(scored, langCol, dropQ))
  }

  /** The gate's threshold-estimation half — the offline TRAIN step a
    * deployment runs on the reference corpus and ships to ingest workers
    * (≤C rows). Null-quality documents are excluded from estimation. */
  def langQualityThresholds(df: DataFrame, idCol: String, textCol: String,
                            langCol: String,
                            dropQ: Double = QualityGateQ): DataFrame =
    thresholdsFromScored(gateScored(df, idCol, textCol, langCol), langCol,
      dropQ)

  private def thresholdsFromScored(scored: DataFrame, langCol: String,
                                   dropQ: Double): DataFrame = {
    require(dropQ > 0 && dropQ <= 1,
      s"langQualityGate: dropQ must be in (0, 1], got $dropQ")
    graft.ops.Percentiles.exactRankSelect(
        scored
          .filter(col("quality_score").isNotNull)
          .select(col("lang"), col("quality_score")),
        "lang", "quality_score", Seq(dropQ))
      .select(col("lang"), col("quality_score").as("lang_threshold"))
  }

  /** The gate's SCORE half against FROZEN thresholds — row-local given
    * the ≤C-row broadcast table, shared with the streaming twin so batch
    * and stream cannot drift on the verdict rule. */
  def langQualityGateWith(df: DataFrame, idCol: String, textCol: String,
                          langCol: String, thresholds: DataFrame): DataFrame =
    gateFromScored(gateScored(df, idCol, textCol, langCol), thresholds)

  private def gateFromScored(scored: DataFrame,
                             thresholds: DataFrame): DataFrame =
    scored
      .join(broadcast(thresholds), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("quality_score"),
        col("lang_threshold"),
        (col("quality_score") >= col("lang_threshold")).as("keep"))
      .orderBy("doc_id")

  private def gateScored(df: DataFrame, idCol: String, textCol: String,
                         langCol: String): DataFrame =
    stats(df, idCol, textCol)
      .select(col("id").cast("long").as("doc_id"), col("quality_score"))
      .join(df.select(col(idCol).cast("long").as("doc_id"),
        col(langCol).as("lang")), Seq("doc_id"))

  /** PMI collocation mining — the phrase-vocabulary step of a tokenizer
    * / phrase-table pipeline (Mikolov et al. 2013 §4 use exactly this
    * score to join phrases before training): adjacent-token bigrams with
    * count ≥ `minCount`, ranked by the PMI ratio
    * `P(w1,w2) / (P(w1)·P(w2)) = c12·N / (c1·c2)` over the bigram
    * position marginals (c1 = w1's count as a LEFT element, c2 = w2's as
    * a RIGHT element — both derived by re-aggregating the bigram table,
    * so the corpus is read once). The ratio is the exp of PMI and orders
    * identically; it is one correctly-rounded double division of exact
    * integer products, so both engines agree bit-for-bit (products stay
    * under 2^53 far beyond any single-corpus vocabulary; a log-domain
    * variant only matters when c12·N overflows, i.e. never for counts
    * from one corpus under ~10^13 bigrams).
    *
    * Scale shape: ONE corpus-sized exchange (the bigram groupBy,
    * map-side-combined to vocab² rows); marginals and the scalar total
    * re-aggregate the bigram TABLE, never the corpus; top-K is a
    * TakeOrdered, never a global sort. */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Int = 5, topK: Int = 30): DataFrame = {
    val t = df.select(tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    val bg = t.select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val u = c12.groupBy(col("w1").as("__uw"))
      .agg(sum("n_pair").as("n_w1"))
    val v = c12.groupBy(col("w2").as("__vw"))
      .agg(sum("n_pair").as("n_w2"))
    val tot = c12.agg(sum("n_pair").as("n_total"))
    c12.join(u, col("w1") === col("__uw")).drop("__uw")
      .join(v, col("w2") === col("__vw")).drop("__vw")
      .crossJoin(broadcast(tot))
      .filter(col("n_pair") >= minCount)
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        (col("n_pair").cast("double") * col("n_total") /
          (col("n_w1") * col("n_w2"))).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Per-document TF-IDF keyword extraction — the top-`k` most
    * characteristic terms of every document, scored `tf · N/df` (the
    * rational idf surrogate: monotone in tf-idf for fixed tf since
    * log is monotone, and exact on both engines as one correctly-rounded
    * double division of exact integers). The per-document rank breaks
    * ties by term, so the output is a total order.
    *
    * Scale shape: tf is the (doc, token) groupBy (one corpus exchange,
    * map-side-combined); df re-aggregates the TF TABLE (never the
    * corpus); N is a 1-row broadcast; the rank window partitions by
    * doc_id — high cardinality, rows per partition bounded by the
    * document's distinct-token count, so no funnel. */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).cast("long").as("doc_id"),
      explode(tokens(col(textCol))).as("w"))
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nd = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfr, "w").crossJoin(broadcast(nd))
      .withColumn("tfidf",
        col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("w"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("w").as("term"),
        col("tf"), col("df"), col("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** c-TF-IDF cluster labeling (Grootendorst 2022 "BERTopic" §2.3 —
    * the topic-labeling step after clustering): per CELL of a trained
    * quantizer, the top-`k` characteristic terms, treating each cell's
    * concatenated documents as ONE class document. Class term frequency
    * `tf` is the term's occurrence count inside the cell; the idf
    * surrogate is [[tfidfKeywords]]'s rational form at cell granularity,
    * `tf·C/cf` with `cf` = number of cells containing the term and `C` =
    * number of non-empty cells — one double division of exact integers,
    * bit-equal on both engines; ties break by term for a total order.
    *
    * Scale shape: cells attach via ONE id-keyed equi-join BEFORE the
    * token explode (the exchange carries text rows, not token rows);
    * the (cell, term) rollup partial-aggregates map-side; `cf` and `C`
    * re-aggregate the TF table (per-cell vocabulary scale, not corpus
    * scale); the rank window partitions by cell over that same TF
    * table, so no partition exceeds a cell's vocabulary. Output:
    * (cell, rank, term, tf, cf, ctfidf) by (cell, rank). */
  def cellTopTerms(df: DataFrame, idCol: String, textCol: String,
                   cells: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"cellTopTerms: k must be positive, got $k")
    val withCell = df
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .join(cells.select(col("vec_id").cast("long").as("doc_id"), col("cell")),
        "doc_id")
      .select(col("cell"), explode(tokens(col("__t"))).as("w"))
    val tf = withCell.groupBy("cell", "w").agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("w").agg(count(lit(1)).as("cf"))
    val nc = tf.select("cell").distinct().agg(count(lit(1)).as("n_cells"))
    tf.join(cf, "w").crossJoin(broadcast(nc))
      .withColumn("ctfidf",
        col("tf").cast("double") * col("n_cells") / col("cf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("cell").orderBy(col("ctfidf").desc, col("w"))))
      .filter(col("rank") <= k)
      .select(col("cell"), col("rank"), col("w").as("term"),
        col("tf"), col("cf"), col("ctfidf"))
      .orderBy("cell", "rank")
  }

  /** Heaps'-law vocabulary growth curve (Heaps 1978; the standard
    * corpus-size diagnostic: distinct types V(n) vs running tokens n —
    * a corpus whose curve flattens early is repetitive/duplicated, one
    * that keeps climbing is still adding information): cumulative docs,
    * tokens and distinct TYPES at `nCheckpoints` equal-width doc-id
    * prefixes, plus the running type/token ratio. All checkpoint math
    * is integer (`bucket = ceil((id-lo+1)·n / width)` as exact integer
    * arithmetic; cuts by integer division), so the curve is bit-equal
    * on both engines; the ratio is one correctly-rounded division.
    *
    * Scale shape: ONE corpus exchange — tokens groupBy(type) with
    * map-side partial min(doc_id) (a type's first appearance decides
    * which prefix first counts it); per-doc token counts are row-local;
    * both reduce to `nCheckpoints`-row frames before the prefix-sum
    * window, which therefore runs over a bounded spine, never the
    * corpus. The driver collect is the 1-row bounds aggregate. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  nCheckpoints: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nCheckpoints >= 1,
      s"vocabGrowth: nCheckpoints must be positive, got $nCheckpoints")
    val spark = df.sparkSession
    // null text ≡ empty text (the lineFrame convention, mirrored in SQL)
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      tokens(coalesce(col(textCol), lit(""))).as("t"))
    val b = base.agg(min("doc_id"), max("doc_id"), count(lit(1))).collect()(0)
    require(b.getLong(2) > 0, "vocabGrowth requires a non-empty corpus")
    val lo = b.getLong(0); val wd = b.getLong(1) - lo + 1
    val n = nCheckpoints.toLong
    // takes the column NAME (both call sites are bare top-level columns):
    // splicing a Column's toString into expr() breaks the moment a
    // qualified or derived Column is passed
    def bucketOf(idName: String): Column =
      expr(s"(($idName - $lo + 1) * $n + ${wd - 1}) div $wd")
    val perDoc = base
      .select(bucketOf("doc_id").as("bk"), size(col("t")).cast("long").as("n_toks"))
      .groupBy("bk").agg(count(lit(1)).as("nd"), sum("n_toks").as("nt"))
    val perType = base.select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy("w").agg(min("doc_id").as("fid"))
      .select(bucketOf("fid").as("bk"))
      .groupBy("bk").agg(count(lit(1)).as("ny"))
    val spine = spark.range(1, n + 1).toDF("checkpoint")
      .select(col("checkpoint").cast("int").as("checkpoint"),
        expr(s"$lo + ($wd * checkpoint) div $n - 1").as("cut_id"))
    val win = Window.orderBy("checkpoint").rowsBetween(Window.unboundedPreceding, 0)
    spine
      .join(perDoc, col("checkpoint") === col("bk"), "left").drop("bk")
      .join(perType, col("checkpoint") === col("bk"), "left").drop("bk")
      .select(col("checkpoint"), col("cut_id"),
        sum(coalesce(col("nd"), lit(0L))).over(win).as("cum_docs"),
        sum(coalesce(col("nt"), lit(0L))).over(win).as("cum_tokens"),
        sum(coalesce(col("ny"), lit(0L))).over(win).as("cum_types"))
      .withColumn("type_token_ratio",
        col("cum_types").cast("double") / col("cum_tokens"))
      .orderBy("checkpoint")
  }
}
