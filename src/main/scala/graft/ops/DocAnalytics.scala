package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, concat, count, lit, max, pmod, struct, sum, when}
import graft.sources.Tables
import graft.text.{QualityScorer, TextCuration, TextDedup, TextStats}
import graft.ann.Similarity

/** The LLM-data-pipeline query surface over the `documents` and
  * `embeddings` tables (the north-star operators beyond the reference's own
  * inventory — dedup, similarity search, text analysis). Each query wraps a
  * reusable operator from [[graft.text.TextDedup]], [[graft.text.TextStats]]
  * or [[graft.ann.Similarity]] and has a value-exact DuckDB oracle in
  * [[graft.OracleSqlDocs]].
  */
object DocAnalytics {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  /** Deterministic url synthesis for the p101/p102 URL-curation queries
    * (the driver's documents table has no url column): one url per doc
    * built from source/lang/doc_id, with scheme, www-prefix, an extra
    * path segment, and a query string varying by doc_id residues so the
    * parser's every branch is hit. [[graft.OracleSqlDocs.urlSynthSql]]
    * is the character-identical DuckDB twin. */
  private[graft] def withUrl(ds: DataFrame): DataFrame =
    ds.select(col("doc_id"), concat(
      when(pmod(col("doc_id"), lit(5)) === 0, "http").otherwise("https"),
      lit("://"),
      when(pmod(col("doc_id"), lit(3)) === 0, "www.").otherwise(""),
      col("source"), lit("-example.com/"),
      col("lang"), lit("/doc/"), col("doc_id").cast("string"),
      when(pmod(col("doc_id"), lit(4)) === 0, "/extra").otherwise(""),
      when(pmod(col("doc_id"), lit(7)) === 0, "?ref=feed").otherwise(""))
      .as("url"))
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)

  /** Query vectors for the knn queries: a fixed small id range, standing in
    * for the "query set" a real ANN service would broadcast. */
  private val QueryMaxId = 20

  /** p103 within-cell prune threshold — low enough that the synthetic
    * embedding corpus yields real drops at every test scale (measured
    * within-cell cosine tops out at ~0.47/0.49/0.53 across sf0.001/0.01/
    * 0.1), so the prune semantics themselves are oracle-verified (not
    * vacuous). The p23 LSH miner uses the same 0.4 for the same reason. */
  val SemDedupMinSim = 0.4

  /** Base directory for oracle-replay artifacts (trained centroids etc.),
    * configurable via `-Dgraft.oracle.dir=` so a packaged deployment isn't
    * pinned to this build tree's path; the default resolves against the
    * process cwd (sbt runs in the repo root → `target/`, build output,
    * never committed). Verify deletes it at startup so a stale artifact
    * from a previous run fails the oracle LOUDLY (missing file) instead of
    * silently verifying old state (round-6 advice). */
  def oracleArtifactDir: String =
    // absolutized because the path is embedded in dumped oracle SQL that a
    // separate DuckDB process replays from its OWN cwd
    new java.io.File(sys.props.getOrElse("graft.oracle.dir", "target/graft-oracle"))
      .getAbsolutePath

  /** Where the p50 query persists its trained quantizer so the DuckDB
    * oracle can replay the SEARCH against the exact centroids the Spark
    * plan inlined. The trainer itself is pinned separately by
    * SimilaritySpec's recall test; persisting decouples search
    * verification from any run-to-run float summation-order wobble in
    * training. */
  def P50CentroidsPath: String = s"$oracleArtifactDir/p50_centroids"

  /** Where the p103 semantic-dedup query persists ITS trained quantizer
    * (independent of p50's — queries must be runnable in any order, so
    * neither reads the other's artifact). */
  def P103CentroidsPath: String = s"$oracleArtifactDir/p103_centroids"

  /** Where the p105/p106 product-quantization queries persist their
    * trained codebooks — one path each (independent runnability, the
    * p50/p103 convention). Rows: (m, code, cv float[]). */
  def P105CodebooksPath: String = s"$oracleArtifactDir/p105_codebooks"
  def P106CodebooksPath: String = s"$oracleArtifactDir/p106_codebooks"

  /** Residual-PQ (8-bit) codebook artifacts — one path per query, the
    * p105/p106 convention. */
  def P109CodebooksPath: String = s"$oracleArtifactDir/p109_codebooks"
  def P110CodebooksPath: String = s"$oracleArtifactDir/p110_codebooks"

  /** BPE merge-table artifact: (merge_rank, l, r, pair_count) rows the
    * p114 apply oracle replays through its recursive replace chain. */
  def P114MergesPath: String = s"$oracleArtifactDir/p114_merges"

  /** p117's own merge table (independent runnability, the p50/p105
    * convention). */
  def P117MergesPath: String = s"$oracleArtifactDir/p117_merges"

  /** p118's codebooks (LUT-ADC residual search). */
  def P118CodebooksPath: String = s"$oracleArtifactDir/p118_codebooks"

  /** p119's trained coarse centroids + residual codebooks (the
    * production residual config: Lloyd MEANS, not lowest-id vectors). */
  def P119CentroidsPath: String = s"$oracleArtifactDir/p119_centroids"
  def P119CodebooksPath: String = s"$oracleArtifactDir/p119_codebooks"

  /** Every artifact path this pipeline writes under [[oracleArtifactDir]] —
    * the EXACT set Verify may clear at startup. Kept as an explicit list so
    * a user-pointed `-Dgraft.oracle.dir` at a shared directory never gets
    * recursively wiped; only framework-owned entries are touched. */
  /** p125's two-level quantizer artifacts: the supercluster table and
    * the cell→super mapping with centroid vectors. */
  def P125SupersPath: String = s"$oracleArtifactDir/p125_supers"
  def P125CellsPath: String = s"$oracleArtifactDir/p125_cells"

  /** p128's persisted deployment index: codebooks + the cell-partitioned
    * codes index itself — the oracle replays the search by READING the
    * stored index (what a deployment's query batch actually scans), not
    * by re-deriving codes. */
  def P128CodebooksPath: String = s"$oracleArtifactDir/p128_codebooks"
  def P128IndexPath: String = s"$oracleArtifactDir/p128_codes_index"

  /** p129/p130's codebooks (IVFADC+R re-ranked search / its recall
    * rollup) — one path each, the p105/p106 convention. */
  def P129CodebooksPath: String = s"$oracleArtifactDir/p129_codebooks"
  def P130CodebooksPath: String = s"$oracleArtifactDir/p130_codebooks"

  /** p140's own merge table (independent runnability, the p117 rule). */
  def P140MergesPath: String = s"$oracleArtifactDir/p140_merges"

  /** p144/p145's merge tables (tokenizer coverage report / summary). */
  def P144MergesPath: String = s"$oracleArtifactDir/p144_merges"
  def P145MergesPath: String = s"$oracleArtifactDir/p145_merges"

  /** p146's merge table (merge-budget compression curve). */
  def P146MergesPath: String = s"$oracleArtifactDir/p146_merges"

  /** p147's trained centroids (D4 prototypicality audit). */
  def P147CentroidsPath: String = s"$oracleArtifactDir/p147_centroids"

  /** p151's OLD and NEW quantizers (assignment-churn audit). */
  def P151OldCentroidsPath: String = s"$oracleArtifactDir/p151_centroids_old"
  def P151NewCentroidsPath: String = s"$oracleArtifactDir/p151_centroids_new"

  /** p152's quantizer over hashed text embeddings (semantic packing). */
  def P152CentroidsPath: String = s"$oracleArtifactDir/p152_centroids"

  /** p154's quantizer over hashed text embeddings (c-TF-IDF labels). */
  def P154CentroidsPath: String = s"$oracleArtifactDir/p154_centroids"

  /** p159's trained centroids (quantizer inertia audit). */
  def P159CentroidsPath: String = s"$oracleArtifactDir/p159_centroids"

  /** p161's residual codebooks (MMR over the deployment search). */
  def P161CodebooksPath: String = s"$oracleArtifactDir/p161_codebooks"

  def oracleArtifactPaths: Seq[String] =
    Seq(P50CentroidsPath, P103CentroidsPath, P105CodebooksPath,
      P106CodebooksPath, P109CodebooksPath, P110CodebooksPath,
      P114MergesPath, P117MergesPath, P118CodebooksPath,
      P119CentroidsPath, P119CodebooksPath,
      P125SupersPath, P125CellsPath,
      P128CodebooksPath, P128IndexPath,
      P129CodebooksPath, P130CodebooksPath, P140MergesPath,
      P144MergesPath, P145MergesPath, P146MergesPath, P147CentroidsPath,
      P151OldCentroidsPath, P151NewCentroidsPath, P152CentroidsPath,
      P154CentroidsPath, P159CentroidsPath, P161CodebooksPath)

  /** p50 phase 1: bounded-Lloyd quantizer training (a multi-pass training
    * pipeline, not query latency — the bench times it separately). */
  def p50Train(s: SparkSession, d: String): Array[(Long, Array[Float])] =
    Similarity.trainIvfCentroids(emb(s, d), "vec_id", "embedding")

  /** p50 phase 2: the IVF search against an already-trained quantizer —
    * the same plan shape as p38 with the centroid table swapped. */
  def p50Search(s: SparkSession, d: String,
                cents: Array[(Long, Array[Float])]): DataFrame =
    Similarity.knnIvfWith(emb(s, d), "vec_id", "embedding",
      col("vec_id") < QueryMaxId, cents)

  private def persistCentroids(s: SparkSession,
                               cents: Array[(Long, Array[Float])],
                               path: String = P50CentroidsPath): Unit = {
    import s.implicits._
    cents.toSeq.toDF("cent_id", "ce").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Persist trained PQ codebooks as (m, code, cv) rows so the DuckDB
    * oracle replays encode + ADC search against the exact floats the
    * Spark plan inlined (the p50 centroid convention). */
  private def persistCodebooks(s: SparkSession,
                               cb: graft.ann.ProductQuantizer.Codebooks,
                               path: String): Unit = {
    import s.implicits._
    cb.zipWithIndex.flatMap { case (book, m) =>
      book.zipWithIndex.map { case (cv, code) => (m, code, cv.toSeq) }
    }.toSeq.toDF("m", "code", "cv").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Synthetic PII planted per document from doc_id — one exact match per
    * pattern family in [[graft.text.TextCuration.PiiPatterns]]. The DuckDB
    * oracle rebuilds this string with the same `||` chain, so the scrubbed
    * text and the pre-scrub counts are value-compared, not just shaped. */
  private def piiAugmented(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{concat, lit}
    val id = col("doc_id").cast("string")
    docs.select(col("doc_id"), concat(
      col("text"),
      lit(" contact user"), id, lit("@example.com call +1 555 010 "), id,
      lit(" ip 10.0.0."), (col("doc_id") % 256).cast("string"),
      lit(" ref "), (col("doc_id") + 900000000L).cast("string")).as("text"))
  }

  /** Plants LINE structure for the repetition signals: the synthetic
    * corpus is single-line, so the p131 query appends the document's
    * 40-char prefix twice (a guaranteed duplicated line) plus a
    * doc_id-varying prefix line — both engines build the identical
    * string with the same concat/substr chain (the [[piiAugmented]]
    * convention), so the line-dedup arithmetic is value-verified on
    * every document rather than degenerate at 1 line / 0 dups. */
  private def lineAugmented(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, concat, lit, substring}
    val t = coalesce(col("text"), lit("")) // null ≡ empty on BOTH engines
    docs.select(col("doc_id"), concat(
      t, lit("\n"),
      substring(t, 1, 40), lit("\n"),
      substring(t, 1, 40), lit("\n"),
      t.substr(lit(1), (col("doc_id") % 20 + lit(10)).cast("int")))
      .as("text"))
  }

  /** Line planting for the Gopher QUALITY rules (p133): a bullet line on
    * doc_id % 3 == 0 (else a plain prefix line), an ellipsis-ended line
    * on doc_id % 4 == 0, and a stopword-bearing line on doc_id % 2 == 0
    * (the synthetic vocabulary contains only "the" from the Gopher set,
    * so without planting the stopword rule — and therefore the verdict —
    * would be a constant). Both engines build the identical string (the
    * [[piiAugmented]] convention), so every flag column verifies with
    * per-document variance. */
  private def qualityAugmented(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, concat, lit, substring, when}
    val t = coalesce(col("text"), lit("")) // null ≡ empty on BOTH engines
    docs.select(col("doc_id"), concat(
      t, lit("\n"),
      when(col("doc_id") % 3 === 0,
        concat(lit("• "), substring(t, 1, 20)))
        .otherwise(concat(lit("plain "), substring(t, 1, 20))),
      lit("\n"),
      when(col("doc_id") % 4 === 0,
        concat(substring(t, 1, 15), lit("...")))
        .otherwise(substring(t, 1, 15)),
      lit("\n"),
      when(col("doc_id") % 2 === 0, lit("words of and that flow"))
        .otherwise(lit("words flow"))).as("text"))
  }

  /** Duplicate planting for the scoped-dedup report (p141): doc_id % 16
    * == 5 rows become one of three constant texts (doc_id % 3 picks the
    * variant), so exact-duplicate groups exist at EVERY scale and span
    * sources — the synthetic corpus has no exact duplicates at sf0.01.
    * Both engines build the identical string (the [[piiAugmented]]
    * convention); non-planted rows keep their raw text (null included —
    * normText treats both the same on both engines). */
  private def dupAugmented(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{concat, lit, when}
    docs.select(col("doc_id"), col("source"),
      when(col("doc_id") % 16 === 5,
        concat(lit("planted duplicate corpus block "),
          (col("doc_id") % 3).cast("string")))
        .otherwise(col("text")).as("text"))
  }

  /** recall@k rollup shared by the p106/p110/p119/p130 recall queries:
    * per-query hit counts of `approx` against the exact brute-force top-k
    * plus the possible-count denominator. `bf` is consumed by TWO plan
    * branches (the hits join and the denominator aggregate), and exchange
    * reuse does not dedupe the O(|queries|·corpus) brute-force subtree
    * under them — the round-16 before plans show the
    * BroadcastNestedLoopJoin + top-k aggregate duplicated per consumer —
    * so the bf frame is localCheckpointed: bounded at |queries|·k
    * (id, id) rows by the ANN-query charter, it materializes once and
    * both branches read the blocks (guide §2.4 remove-the-second-pass /
    * §5 cut-lineage; the p122/p152 materialization convention). */
  private def recallRollup(bfIn: DataFrame, approx: DataFrame): DataFrame = {
    val bf = bfIn.localCheckpoint()
    val hits = bf.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    bf.groupBy("query_id").agg(count(lit(1)).as("n_possible"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_possible"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_possible")).as("recall_at_k"))
      .orderBy("query_id")
  }

  /** Multi-phase pipelines (training + search), keyed by registered query
    * name: `(finalPhaseLabel, fn)` where `fn`'s callback fires with each
    * completed phase's label at its boundary. The bench times phases
    * through THIS — the exact code path the registered query runs — so the
    * benchmarked and correctness-verified pipelines cannot drift, and a
    * query rename breaks the map lookup visibly instead of silently
    * disabling the phase split (round-6 advice). */
  val phasedQueries: Map[String, (String, (SparkSession, String, String => Unit) => DataFrame)] =
    Map("p50_knn_ivf_trained" -> ("search", (s, d, onPhase) => {
      val cents = p50Train(s, d)
      persistCentroids(s, cents)
      onPhase("train")
      p50Search(s, d, cents)
    }),
    // ICLM semantic packing: the text→hashed-embedding→trained-cell loop
    // (p121 + p50's trainer) feeding cell-scoped token-budget packing —
    // related documents land in the same packed sequence
    "p152_semantic_packing" -> ("pack", (s, d, onPhase) => {
      val ds = docs(s, d)
      // localCheckpoint (the p122/p127 pattern): the embedding build —
      // tokenize + two exchanges — is consumed by the trainer's init pass,
      // every Lloyd iteration, AND the final assignment; materialized once
      // it is 1 fixed-width row/doc instead of 5 corpus-scale rebuilds
      val he = TextStats.hashedEmbedding(ds, "doc_id", "text").localCheckpoint()
      val cents = Similarity.trainIvfCentroids(he, "vec_id", "e")
      persistCentroids(s, cents, P152CentroidsPath)
      onPhase("train")
      val cells = Similarity.assignCells(he, "vec_id", "e", cents)
        .select("vec_id", "cell")
      TextCuration.semanticPacking(ds, "doc_id", "text", cells)
    }),
    // c-TF-IDF cluster labels (BERTopic's labeling step): trained cells
    // over hashed text embeddings (the p152 chain), then the top-3
    // characteristic terms per cell under the rational cell-idf surrogate
    "p154_cell_topterms" -> ("label", (s, d, onPhase) => {
      val ds = docs(s, d)
      // localCheckpoint: same 5-consumer embedding reuse as p152 above
      val he = TextStats.hashedEmbedding(ds, "doc_id", "text").localCheckpoint()
      val cents = Similarity.trainIvfCentroids(he, "vec_id", "e")
      persistCentroids(s, cents, P154CentroidsPath)
      onPhase("train")
      val cells = Similarity.assignCells(he, "vec_id", "e", cents)
        .select("vec_id", "cell")
      TextStats.cellTopTerms(ds, "doc_id", "text", cells)
    }),
    // quantizer assignment-churn audit: cell under yesterday's quantizer
    // (trained on the even-id half, the snapshot-growth simulation) vs
    // today's (full corpus); both assignments fused row-local in ONE
    // scan; both quantizers persisted for the oracle replay
    "p151_quantizer_churn" -> ("assign", (s, d, onPhase) => {
      val e = emb(s, d)
      val centsOld = Similarity.trainIvfCentroids(
        e.filter(pmod(col("vec_id"), lit(2)) === 0), "vec_id", "embedding")
      val centsNew = Similarity.trainIvfCentroids(e, "vec_id", "embedding")
      persistCentroids(s, centsOld, P151OldCentroidsPath)
      persistCentroids(s, centsNew, P151NewCentroidsPath)
      onPhase("train")
      Similarity.assignmentChurn(e, "vec_id", "embedding", centsOld, centsNew)
    }),
    // quantizer inertia audit: per-cell SSE to the trained centroid
    // (Lloyd's objective) in 2^-20 fixed point, mean and total-share —
    // the training-quality companion of p62's balance profile
    "p159_quantizer_inertia" -> ("report", (s, d, onPhase) => {
      val cents = p50Train(s, d)
      persistCentroids(s, cents, P159CentroidsPath)
      onPhase("train")
      Similarity.inertiaReport(emb(s, d), "vec_id", "embedding", cents)
    }),
    // D4 prototypicality audit (SemDeDup's published companion): cosine
    // to the assigned trained centroid, within-cell rank, integer-exact
    // drop verdict; centroids persisted for the oracle replay
    "p147_prototypicality" -> ("prune", (s, d, onPhase) => {
      val cents = p50Train(s, d)
      persistCentroids(s, cents, P147CentroidsPath)
      onPhase("train")
      Similarity.prototypicalityPrune(emb(s, d), "vec_id", "embedding",
        cents)
    }),
    // SemDeDup: the same bounded-Lloyd trainer, then cell-scoped cosine
    // pruning; centroids persisted so the oracle replays the assignment
    // + prune against the exact trained floats (the p50 convention)
    "p103_semantic_dedup" -> ("dedup", (s, d, onPhase) => {
      val cents = p50Train(s, d)
      persistCentroids(s, cents, P103CentroidsPath)
      onPhase("train")
      graft.ann.Similarity.semanticDedup(emb(s, d), "vec_id", "embedding",
        cents, minSim = SemDedupMinSim)
    }),
    // IVF-PQ: per-subspace Lloyd codebooks (train phase, persisted for
    // oracle replay), then coarse-cell probing + asymmetric-distance
    // ranking over the 8-byte codes. Coarse layer = p38's deterministic
    // lowest-id quantizer, so only the codebooks need persisting.
    "p105_knn_ivfpq" -> ("search", (s, d, onPhase) => {
      val e = emb(s, d)
      val cb = graft.ann.ProductQuantizer.trainCodebooks(e, "vec_id", "embedding")
      persistCodebooks(s, cb, P105CodebooksPath)
      onPhase("train")
      val cents = Similarity.lowestIdCentroids(e, "vec_id", "embedding", 8)
      graft.ann.ProductQuantizer.knnIvfPq(e, "vec_id", "embedding",
        col("vec_id") < QueryMaxId, cents, cb)
    }),
    // Residual IVF-PQ (by_residual=true, the production 8-bit config):
    // codebooks trained on coarse-cell RESIDUALS with k=256 codes per
    // subspace; search carries the query residual per probed cell. The
    // coarse layer stays p38's deterministic lowest-id quantizer so only
    // the codebooks need persisting.
    "p109_knn_ivfpq_residual" -> ("search", (s, d, onPhase) => {
      val e = emb(s, d)
      val cents = Similarity.lowestIdCentroids(e, "vec_id", "embedding", 8)
      val cb = graft.ann.ProductQuantizer.trainResidualCodebooks(
        e, "vec_id", "embedding", cents, m = 16)
      persistCodebooks(s, cb, P109CodebooksPath)
      onPhase("train")
      graft.ann.ProductQuantizer.knnIvfPqResidual(e, "vec_id", "embedding",
        col("vec_id") < QueryMaxId, cents, cb)
    }),
    // LUT-ADC over the codes-only residual index (Jégou §V, the
    // production ADC): per-probe m·k distance tables, per-candidate
    // m lookups; dist = the m-term ordered sum of subspace partials
    // (its own float contract — see the operator doc), oracle-mirrored
    // with an ORDER BY m fold.
    "p118_knn_ivfpq_lut" -> ("search", (s, d, onPhase) => {
      val e = emb(s, d)
      val cents = Similarity.lowestIdCentroids(e, "vec_id", "embedding", 8)
      val cb = graft.ann.ProductQuantizer.trainResidualCodebooks(
        e, "vec_id", "embedding", cents, m = 16)
      persistCodebooks(s, cb, P118CodebooksPath)
      onPhase("train")
      graft.ann.ProductQuantizer.knnIvfPqResidualLut(e, "vec_id", "embedding",
        col("vec_id") < QueryMaxId, cents, cb)
    }),
    // the deployment split END-TO-END as one oracle-gated query: build
    // the cell-partitioned persisted codes index (p118's m=16 residual
    // config), then search THROUGH THE STORE — probed cells become a
    // static partition filter, so the scan reads ~nProbe/nCells of the
    // layout (PartitionedAnnIndexSpec plan-locks that), and the oracle
    // replays LUT-ADC from the STORED codes, not a re-derivation: a
    // corrupted write or a codes/cell roundtrip bug fails the hash.
    "p128_persisted_index_search" -> ("search", (s, d, onPhase) => {
      val e = emb(s, d)
      val cents = Similarity.lowestIdCentroids(e, "vec_id", "embedding", 8)
      val cb = graft.ann.ProductQuantizer.trainResidualCodebooks(
        e, "vec_id", "embedding", cents, m = 16)
      persistCodebooks(s, cb, P128CodebooksPath)
      graft.ann.ProductQuantizer.writeCellPartitionedIndex(
        graft.ann.ProductQuantizer.residualCodesIndex(
          e, "vec_id", "embedding", cents, cb), P128IndexPath)
      onPhase("ingest")
      graft.ann.ProductQuantizer.searchPersistedIndexLut(s, P128IndexPath,
        e.filter(col("vec_id") < QueryMaxId).select(
          col("vec_id").cast("long").as("query_id"),
          col("embedding").as("qe")),
        cents, cb)
    }),
    // IVFADC+R (Jégou §VI): the p118 LUT-ADC search widened to a
    // 30-candidate shortlist, then exact cosine re-rank against the
    // SOURCE vectors — shortlist broadcast, corpus never shuffles. The
    // oracle replays the LUT fold to rn<=30 and the exact re-rank.
    "p129_knn_ivfpq_rerank" -> ("search", (s, d, onPhase) => {
      val e = emb(s, d)
      val cents = Similarity.lowestIdCentroids(e, "vec_id", "embedding", 8)
      val cb = graft.ann.ProductQuantizer.trainResidualCodebooks(
        e, "vec_id", "embedding", cents, m = 16)
      persistCodebooks(s, cb, P129CodebooksPath)
      onPhase("train")
      graft.ann.ProductQuantizer.knnIvfPqRerank(e, "vec_id", "embedding",
        col("vec_id") < QueryMaxId, cents, cb, kShort = 30)
    }),
    // MMR over the DEPLOYMENT path (p161): the p129 IVFADC+R search
    // widened to a top-8 re-ranked pool, then the SAME greedy p160 runs
    // on brute-force candidates — compressed index -> shortlist ->
    // exact re-rank -> diversity, the full RAG retrieval stack
    "p161_mmr_deployed" -> ("search", (s, d, onPhase) => {
      val e = emb(s, d)
      val cents = Similarity.lowestIdCentroids(e, "vec_id", "embedding", 8)
      val cb = graft.ann.ProductQuantizer.trainResidualCodebooks(
        e, "vec_id", "embedding", cents, m = 16)
      persistCodebooks(s, cb, P161CodebooksPath)
      onPhase("train")
      Similarity.mmrOverSearch(
        graft.ann.ProductQuantizer.knnIvfPqRerank(e, "vec_id", "embedding",
          col("vec_id") < QueryMaxId, cents, cb,
          k = Similarity.MmrKCand, kShort = 30),
        e, "vec_id", "embedding")
    }),
    // what re-ranking buys: p110's recall rollup with the SAME decoded-
    // ADC contract and nProbe=8, but the shortlist widened to 30 and
    // exact-reranked before the top-5 cut — recall@5 vs the 0.46 ADC
    // tier, measured per query and value-verified
    "p130_rerank_recall" -> ("recall", (s, d, onPhase) => {
      val e = emb(s, d)
      val cents = Similarity.lowestIdCentroids(e, "vec_id", "embedding", 8)
      val cb = graft.ann.ProductQuantizer.trainResidualCodebooks(
        e, "vec_id", "embedding", cents, m = 16)
      persistCodebooks(s, cb, P130CodebooksPath)
      onPhase("train")
      val queries = e.filter(col("vec_id") < QueryMaxId).select(
        col("vec_id").cast("long").as("query_id"), col("embedding").as("qe"))
      val bf = Similarity.knnBruteForce(e, "vec_id", "embedding",
        col("vec_id") < QueryMaxId).select("query_id", "neighbor_id")
      val rr = graft.ann.ProductQuantizer.rerankExact(
        graft.ann.ProductQuantizer.knnIvfPqResidual(e, "vec_id",
          "embedding", col("vec_id") < QueryMaxId, cents, cb,
          k = 30, nProbe = 8),
        e, "vec_id", "embedding", queries)
        .select("query_id", "neighbor_id")
      recallRollup(bf, rr)
    }),
    // the residual tier's compression quality: recall@5 of residual ADC
    // probing ALL 8 cells (= exhaustive, since the residual distance is
    // defined per candidate cell) against exact brute force — the
    // apples-to-apples upgrade measure over p106's raw-vector 4-bit codes
    "p110_pqr_recall" -> ("recall", (s, d, onPhase) => {
      val e = emb(s, d)
      val cents = Similarity.lowestIdCentroids(e, "vec_id", "embedding", 8)
      val cb = graft.ann.ProductQuantizer.trainResidualCodebooks(
        e, "vec_id", "embedding", cents, m = 16)
      persistCodebooks(s, cb, P110CodebooksPath)
      onPhase("train")
      val bf = Similarity.knnBruteForce(e, "vec_id", "embedding",
        col("vec_id") < QueryMaxId).select("query_id", "neighbor_id")
      val pq = graft.ann.ProductQuantizer.knnIvfPqResidual(e, "vec_id",
        "embedding", col("vec_id") < QueryMaxId, cents, cb, nProbe = 8)
        .select("query_id", "neighbor_id")
      recallRollup(bf, pq)
    }),
    // BPE subword tokenizer: merge rules trained on the word vocabulary
    // (deterministic integer argmax — spec-pinned against the hand-
    // computed Sennrich fixture), persisted, then applied as a row-local
    // replace fold; the oracle replays the identical chain via a
    // recursive CTE over the persisted merges.
    "p114_bpe_tokenize" -> ("apply", (s, d, onPhase) => {
      val ds = docs(s, d)
      val merges = graft.text.BpeTokenizer.trainMerges(ds, "text")
      import s.implicits._
      merges.map(m => (m.merge_rank, m.left, m.right, m.pair_count))
        .toDF("merge_rank", "l", "r", "pair_count").coalesce(1)
        .write.mode("overwrite").parquet(P114MergesPath)
      onPhase("train")
      graft.text.BpeTokenizer.tokenize(ds, "doc_id", "text", merges)
    }),
    // BPE-token mixture budgets: the p96/p97 keyed-prefix-sum budget
    // fill weighted by REAL subword token counts instead of whitespace
    // words — what a training-mix planner actually budgets on
    "p117_bpe_budget" -> ("budget", (s, d, onPhase) => {
      val ds = docs(s, d)
      val merges = graft.text.BpeTokenizer.trainMerges(ds, "text")
      import s.implicits._
      merges.map(m => (m.merge_rank, m.left, m.right, m.pair_count))
        .toDF("merge_rank", "l", "r", "pair_count").coalesce(1)
        .write.mode("overwrite").parquet(P117MergesPath)
      onPhase("train")
      val tok = graft.text.BpeTokenizer.tokenize(ds, "doc_id", "text", merges)
        .select(col("doc_id").as("id"), col("n_bpe_tokens"))
      val langs = ds.select(col("doc_id").as("id"), col("lang"))
      TextCuration.tokenBudgetSample(langs.join(tok, "id"),
          "id", "lang", "n_bpe_tokens", budget = 8000L)
        .select(col("id"), col("key").as("lang"),
          col("weight").as("n_bpe_tokens"),
          col("cum_weight").as("cum_lang_tokens"))
        .orderBy("id")
    }),
    // tokenizer vocabulary-coverage report: top-25 corpus words by
    // frequency with their fragmentation under the frozen merges —
    // vocabulary-sized, never corpus-sized (coverage is a property of
    // the type distribution)
    "p144_token_coverage" -> ("report", (s, d, onPhase) => {
      val ds = docs(s, d)
      val merges = graft.text.BpeTokenizer.trainMerges(ds, "text")
      import s.implicits._
      merges.map(m => (m.merge_rank, m.left, m.right, m.pair_count))
        .toDF("merge_rank", "l", "r", "pair_count").coalesce(1)
        .write.mode("overwrite").parquet(P144MergesPath)
      onPhase("train")
      graft.text.BpeTokenizer.coverageReport(ds, "text", merges)
    }),
    // the merge-budget compression curve: chars/token under prefixes of
    // ONE trained merge table, every budget fused into a single corpus
    // pass (a prefix of a sequential merge table is a valid tokenizer)
    "p146_merge_budget" -> ("curve", (s, d, onPhase) => {
      val ds = docs(s, d)
      val merges = graft.text.BpeTokenizer.trainMerges(ds, "text")
      import s.implicits._
      merges.map(m => (m.merge_rank, m.left, m.right, m.pair_count))
        .toDF("merge_rank", "l", "r", "pair_count").coalesce(1)
        .write.mode("overwrite").parquet(P146MergesPath)
      onPhase("train")
      graft.text.BpeTokenizer.mergeBudgetCurve(ds, "text", merges)
    }),
    // the one-row corpus coverage summary beside p144's detail table
    "p145_coverage_summary" -> ("summary", (s, d, onPhase) => {
      val ds = docs(s, d)
      val merges = graft.text.BpeTokenizer.trainMerges(ds, "text")
      import s.implicits._
      merges.map(m => (m.merge_rank, m.left, m.right, m.pair_count))
        .toDF("merge_rank", "l", "r", "pair_count").coalesce(1)
        .write.mode("overwrite").parquet(P145MergesPath)
      onPhase("train")
      graft.text.BpeTokenizer.coverageSummary(ds, "text", merges)
    }),
    // per-language BPE tokenizer fertility (tokens/word, chars/token):
    // the tokenizer-bias report a multilingual pipeline publishes;
    // merges persisted for the oracle's recursive replay (the p117
    // own-artifact rule)
    "p140_token_fertility" -> ("rollup", (s, d, onPhase) => {
      val ds = docs(s, d)
      val merges = graft.text.BpeTokenizer.trainMerges(ds, "text")
      import s.implicits._
      merges.map(m => (m.merge_rank, m.left, m.right, m.pair_count))
        .toDF("merge_rank", "l", "r", "pair_count").coalesce(1)
        .write.mode("overwrite").parquet(P140MergesPath)
      onPhase("train")
      graft.text.BpeTokenizer.fertilityReport(ds, "doc_id", "text", "lang",
        merges)
    }),
    // p110 with the PRODUCTION coarse layer: Lloyd-trained MEANS instead
    // of lowest-id vectors — residuals against means have less variance
    // (r13_ann_fused.md quantifies the lowest-id penalty), so this is
    // the config a deployment ships; both artifacts persisted, oracle
    // replays assignment + residuals + encode + ADC against them.
    "p119_pqr_recall_trained" -> ("recall", (s, d, onPhase) => {
      val e = emb(s, d)
      val cents = Similarity.trainIvfCentroids(e, "vec_id", "embedding")
      persistCentroids(s, cents, P119CentroidsPath)
      val cb = graft.ann.ProductQuantizer.trainResidualCodebooks(
        e, "vec_id", "embedding", cents, m = 16)
      persistCodebooks(s, cb, P119CodebooksPath)
      onPhase("train")
      val bf = Similarity.knnBruteForce(e, "vec_id", "embedding",
        col("vec_id") < QueryMaxId).select("query_id", "neighbor_id")
      val pq = graft.ann.ProductQuantizer.knnIvfPqResidual(e, "vec_id",
        "embedding", col("vec_id") < QueryMaxId, cents, cb, nProbe = 8)
        .select("query_id", "neighbor_id")
      recallRollup(bf, pq)
    }),
    // PQ compression quality as an oracle-checked QUERY: per-query
    // recall@5 of the exhaustive ADC scan (IndexPQ) against exact brute
    // force — integer hits + one exact division per row.
    "p106_pq_recall" -> ("recall", (s, d, onPhase) => {
      val e = emb(s, d)
      val cb = graft.ann.ProductQuantizer.trainCodebooks(e, "vec_id", "embedding")
      persistCodebooks(s, cb, P106CodebooksPath)
      onPhase("train")
      val bf = Similarity.knnBruteForce(e, "vec_id", "embedding",
        col("vec_id") < QueryMaxId).select("query_id", "neighbor_id")
      val pq = graft.ann.ProductQuantizer.knnPq(e, "vec_id", "embedding",
        col("vec_id") < QueryMaxId, cb).select("query_id", "neighbor_id")
      recallRollup(bf, pq)
    }))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p13_exact_dedup" -> ((s, d) =>
      TextDedup.exactDedup(docs(s, d), "doc_id", "text")),
    "p14_minhash_neardup" -> ((s, d) =>
      TextDedup.minhashNearDup(docs(s, d), "doc_id", "text")),
    // the cap-biting twin of p14 (maxBucket = 2 < the corpus's largest
    // band bucket): oracle-pins the hot-bucket skip semantics themselves
    "p91_minhash_capped" -> ((s, d) =>
      TextDedup.minhashNearDup(docs(s, d), "doc_id", "text", maxBucket = 2)),
    // exact mode (cap 0) — explicitly opted into; small corpora only
    "p15_ngram_jaccard" -> ((s, d) =>
      TextDedup.ngramJaccardPairs(docs(s, d), "doc_id", "text", TextDedup.MaxDf(0))),
    // the scale-safe configuration: document-frequency cap bounds the
    // O(df²) pair blow-up of hot shingles (jaccard becomes a lower bound)
    // — the mode you'd run at 100 TB, verified against a cap-mirroring
    // oracle.
    "p15b_ngram_jaccard_capped" -> ((s, d) =>
      TextDedup.ngramJaccardPairs(docs(s, d), "doc_id", "text", TextDedup.MaxDf(4))),
    // winnowing/MOSS match report: substring-granular fingerprint overlap
    // pairs over the window-min index, hot fingerprints df-capped at 16
    // (the p93 cap convention)
    "p158_winnowing_pairs" -> ((s, d) =>
      TextDedup.winnowingPairs(docs(s, d), "doc_id", "text", TextDedup.MaxDf(16))),
    // cap-biting AT sf0.1: the sf0.1 corpus's duplicate families push
    // shared-shingle df to ~25, so cap 4 (p15b) drops every true
    // near-dup pair there and the capped path's positives go untested at
    // the larger gate scale. Cap 16 keeps the duplicate families (178
    // rows at sf0.1) while still dropping the hottest shingles (exact
    // finds 256) — the dual-scale gate's positive-case coverage.
    "p93_ngram_jaccard_cap16" -> ((s, d) =>
      TextDedup.ngramJaccardPairs(docs(s, d), "doc_id", "text", TextDedup.MaxDf(16))),
    // the overlap coefficient |A∩B|/min(|A|,|B|): subset-duplicate pairs
    // (quotes, boilerplate embedding) that Jaccard structurally misses;
    // cap 16 = the p93 dual-scale configuration, and it BITES at sf0.1
    // (179 pairs vs p98's uncapped 256 — the cap-drop semantics are
    // themselves oracle-verified at the scale where hot shingles exist)
    "p94_containment_pairs" -> ((s, d) =>
      TextDedup.containmentPairs(docs(s, d), "doc_id", "text", TextDedup.MaxDf(16))),
    // uncapped ground-truth twin of p94 (cap 0 = no df cap), mirroring the
    // p15↔p15b pairing: verifies TRUE containment semantics — at sf0.1 the
    // 77 pairs cap-16 drops are exactly the ones riding df>16 shingles
    "p98_containment_exact" -> ((s, d) =>
      TextDedup.containmentPairs(docs(s, d), "doc_id", "text", TextDedup.MaxDf(0))),
    // chunk-granularity exact dedup: p81's context chunks → one canonical
    // copy per distinct chunk hash (the RAG-index dedup step)
    "p95_chunk_dedup" -> ((s, d) =>
      TextCuration.chunkDedup(docs(s, d), "doc_id", "text")),
    // data mixing: per-language token budget greedily filled in id order —
    // the keyed distributed prefix sum (never Window.partitionBy(lang)
    // over raw rows, which would funnel a dominant language through one
    // task at 100 TB)
    "p96_mixture_sample" -> ((s, d) => {
      val ds = docs(s, d)
      val lang = TextStats.langId(ds, "doc_id", "text")
        .select(col("id"), col("predicted_lang"))
      val ntok = TextStats.stats(ds, "doc_id", "text")
        .select(col("id"), col("n_tokens"))
      TextCuration.tokenBudgetSample(lang.join(ntok, "id"),
          "id", "predicted_lang", "n_tokens", budget = 4000L)
        .select(col("id"), col("key").as("predicted_lang"),
          col("weight").as("n_tokens"), col("cum_weight").as("cum_lang_tokens"))
        .orderBy("id")
    }),
    // multi-language mixture configuration: keyed by the corpus's OWN
    // `lang` metadata column — 5 languages, each with >4000 corpus tokens
    // at sf0.1, so the per-key budget BINDS for every key (p96's heuristic
    // langId collapses this corpus to en/und and leaves 3 budgets
    // unexercised); at sf0.01 three languages fall under budget, which
    // also pins the take-everything path per key
    "p97_mixture_multilang" -> ((s, d) => {
      val ds = docs(s, d)
      val ntok = TextStats.stats(ds, "doc_id", "text")
        .select(col("id"), col("n_tokens"))
      TextCuration.tokenBudgetSample(
          ds.select(col("doc_id").as("id"), col("lang")).join(ntok, "id"),
          "id", "lang", "n_tokens", budget = 4000L)
        .select(col("id"), col("key").as("lang"),
          col("weight").as("n_tokens"), col("cum_weight").as("cum_lang_tokens"))
        .orderBy("id")
    }),
    // SPAN-level dedup (repeated k-token windows removed corpus-wide,
    // canonical min-(doc,pos) occurrence kept) — the substring-granularity
    // counterpart of p13: repeated boilerplate inside otherwise-unique
    // documents is what document-level dedup can't touch.
    "p87_span_dedup" -> ((s, d) =>
      TextDedup.spanDedup(docs(s, d), "doc_id", "text")),
    // the substring-dedup AUDIT view: maximal duplicated extents per
    // document (keeper occurrences included — it reports duplication,
    // not removal), with window support and the covered text
    "p135_dup_span_extents" -> ((s, d) =>
      TextDedup.dupSpanExtents(docs(s, d), "doc_id", "text")),
    // token-balanced contiguous shard cuts (export planning): integer-
    // exact prefix-sum assignment, the writer's plan side
    "p136_shard_assign" -> ((s, d) =>
      TextCuration.shardAssign(docs(s, d), "doc_id", "text")),
    // C4-style corpus-wide line dedup over the planted multi-line corpus
    // (qualityAugmented: two constant line values shared by ~half the
    // corpus each, plus cross-doc prefix-line collisions and sf0.1's
    // duplicate documents — keep-first across documents; within-doc
    // duplicates only where prefixes coincide)
    "p137_line_dedup" -> ((s, d) =>
      TextDedup.lineDedup(qualityAugmented(docs(s, d)), "doc_id", "text")),
    // FineWeb §3.2 dedup-scope audit: per-source removals under scoped
    // vs global exact dedup over planted cross-source duplicates
    "p141_scoped_dedup" -> ((s, d) =>
      TextDedup.scopedDedupReport(dupAugmented(docs(s, d)),
        "doc_id", "text", "source")),
    "p16_simhash" -> ((s, d) =>
      TextDedup.simhash(docs(s, d), "doc_id", "text")),
    "p17_simhash_neardup" -> ((s, d) =>
      TextDedup.simhashNearDup(docs(s, d), "doc_id", "text")),
    // the dedup-pipeline keystone: pair mining -> connected components ->
    // one (doc_id, group_id) row per paired document; the oracle's
    // recursive-CTE closure mirrors exactly this composition.
    "p37_dedup_groups" -> ((s, d) =>
      TextDedup.duplicateGroups(
        TextDedup.simhashNearDup(docs(s, d), "doc_id", "text"), "doc_a", "doc_b")),
    "p18_text_stats" -> ((s, d) =>
      TextStats.stats(docs(s, d), "doc_id", "text")),
    "p19_lang_id" -> ((s, d) =>
      TextStats.langId(docs(s, d), "doc_id", "text")),
    "p20_doc_fingerprint" -> ((s, d) =>
      TextStats.fingerprint(docs(s, d), "doc_id", "text")),
    "p36_token_counts" -> ((s, d) =>
      TextStats.tokenCounts(docs(s, d), "doc_id", "text")),
    // statistical LM-style quality signal: score every doc's bigrams
    // against counts trained on the pmod(id,10)≠0 split (transcendental-
    // free perplexity stand-in — see the operator's scaladoc)
    "p88_bigram_novelty" -> ((s, d) =>
      TextStats.bigramNovelty(docs(s, d), "doc_id", "text")),
    // CCNet archetype, step 1: conditional-bigram LM surprisal in whole
    // bits (transcendental-free — exact on both engines), trained on the
    // pmod(id,10)≠0 split, every doc scored
    "p138_lm_surprisal" -> ((s, d) =>
      TextStats.lmSurprisal(docs(s, d), "doc_id", "text")),
    // CCNet archetype, step 2: head/middle/tail buckets against
    // PER-LANGUAGE exact tertiles of bits-per-bigram (Wenzek §4.3)
    "p139_ccnet_buckets" -> ((s, d) =>
      TextStats.surprisalBuckets(docs(s, d), "doc_id", "text", "lang")),
    // Gopher repetition signals (Rae et al. 2021 §A1.1): dup-line
    // fractions, top 2/3-gram char coverage, dup 5-gram fraction — line
    // structure planted engine-mirrored (the piiAugmented convention)
    // because the synthetic corpus is single-line
    "p131_repetition_signals" -> ((s, d) =>
      TextStats.repetitionSignals(lineAugmented(docs(s, d)), "doc_id", "text")),
    // the published Gopher thresholds over those signals: per-rule flags
    // + keep verdict, so removals are attributable in a curation report
    "p132_gopher_filter" -> ((s, d) =>
      TextStats.gopherRepetitionFilter(lineAugmented(docs(s, d)), "doc_id", "text")),
    // the Gopher QUALITY rules (Table A1's non-repetition half):
    // measures + flags + verdict, with bullet/ellipsis line structure
    // planted engine-mirrored as a doc_id function so the line rules
    // verify with real variance
    "p133_gopher_quality" -> ((s, d) =>
      TextStats.gopherQualityRules(qualityAugmented(docs(s, d)), "doc_id", "text")),
    // corpus-level curation report: per-rule flagged counts/fractions
    // over BOTH Gopher families — the removal-attribution table a
    // curation run publishes; two narrow aggregates, one row each
    "p134_curation_report" -> ((s, d) =>
      TextStats.curationReport(
        TextStats.gopherQualityRules(qualityAugmented(docs(s, d)), "doc_id", "text"),
        TextStats.gopherRepetitionFilter(lineAugmented(docs(s, d)), "doc_id", "text"))),
    // TRAINED quality classifier (fastText/CCNet archetype): hashed-token
    // Naive-Bayes counts trained on the heuristic-labeled pmod(id,10)≠0
    // split, every doc scored (transcendental-free evidence ratio — see
    // the operator's scaladoc); the holdout rows show generalization
    "p99_quality_scorer" -> ((s, d) =>
      QualityScorer.qualityScorer(docs(s, d), "doc_id", "text")),
    // the scorer's held-out confusion matrix + accuracy as a 1-row query:
    // model evaluation as a first-class oracle-gated pipeline step
    "p100_scorer_eval" -> ((s, d) =>
      QualityScorer.scorerEval(
        QualityScorer.qualityScorer(docs(s, d), "doc_id", "text"))),
    // the scorer's operating curve: per-threshold keep counts, confusion
    // cells and precision/recall on the holdout split — the calibration
    // table that picks the production filter threshold
    "p107_threshold_sweep" -> ((s, d) =>
      QualityScorer.thresholdSweep(
        QualityScorer.qualityScorer(docs(s, d), "doc_id", "text"))),
    // Bloom-filter seen-set probe: doc_id < 25 as the absorbed set (the
    // p42 convention), 64-bit filter so false positives occur at test
    // scale and their semantics are oracle-pinned (maybe_seen vs the
    // exact is_seen ground truth)
    "p108_bloom_probe" -> ((s, d) =>
      TextCuration.bloomSeenProbe(docs(s, d), "doc_id", "text",
        col("doc_id") < 25)),
    // URL curation (RefinedWeb/C4 family) over a deterministically
    // synthesized url column (the driver corpus carries none — scheme,
    // www-prefix, path depth, and query string vary by doc_id residues so
    // every parser branch is exercised; the oracle rebuilds the identical
    // strings)
    "p101_url_parts" -> ((s, d) =>
      TextCuration.urlParts(withUrl(docs(s, d)), "doc_id", "url")),
    // per-domain document cap (cap 15 < the ~25 docs/domain the corpus's
    // 20 sources yield at every scale, so the cap BITES and the kept-rank
    // semantics are themselves oracle-verified)
    "p102_domain_cap" -> ((s, d) =>
      TextCuration.domainCapSample(
        TextCuration.urlParts(withUrl(docs(s, d)), "doc_id", "url"),
        "id", "domain", cap = 15L)),
    // SemDeDup (train + cell-scoped cosine prune) — a phased pipeline
    // like p50; the oracle replays against the persisted centroids
    "p103_semantic_dedup" -> ((s, d) =>
      phasedQueries("p103_semantic_dedup")._2(s, d, _ => ())),
    // DSIR-style importance selection: target = the corpus's 'en' slice,
    // raw = the rest; top-100 most-target-like raw documents (the
    // domain-matched data-selection step between raw crawl and train mix)
    "p104_dsir_select" -> ((s, d) =>
      graft.text.ImportanceSampler.dsirSelect(docs(s, d), "doc_id", "text",
        col("lang") === "en")),
    // TRAINED language-id (fastText-langid archetype): multi-class NB
    // over hashed tokens, metadata-lang labels on the pmod(id,10)≠0
    // split, exact double-ratio argmax votes; p19's marker heuristic is
    // the bootstrap this distills away
    "p112_langid_trained" -> ((s, d) =>
      graft.text.LangClassifier.langScorer(docs(s, d), "doc_id", "text", "lang")),
    // its held-out confusion matrix — model evaluation as a first-class
    // oracle-gated step (the p100 convention, C×C cells)
    "p113_langid_confusion" -> ((s, d) =>
      graft.text.LangClassifier.langConfusion(
        graft.text.LangClassifier.langScorer(docs(s, d), "doc_id", "text", "lang"))),
    // the text → vector → ANN loop closed WITHOUT a model: hashed-BoW
    // signed-projection embeddings (integer sums, oracle-exact) fed to
    // the same cosine machinery as the embeddings table
    // localCheckpoint: knnBruteForce consumes its input from BOTH join
    // sides (corpus + query set), so the lazy form re-ran the tokenize +
    // two-exchange embedding build twice (the p122 rationale, two
    // consumers instead of six)
    "p121_text_knn" -> ((s, d) =>
      Similarity.knnBruteForce(
        TextStats.hashedEmbedding(docs(s, d), "doc_id", "text").localCheckpoint(),
        "vec_id", "e", col("vec_id") < QueryMaxId)),
    // embedding-cosine near-dup over TEXT (the north-star list's last
    // uncomposed entry): LSH-banded pair mining over the hashed-BoW
    // vectors at cosine ≥ 0.9 — exact dup families land at 1.0, near-dup
    // families in the high-cosine ball
    // localCheckpoint: the miner references its input frame from six
    // consumers (banding, the cap audit, both self-join sides, both
    // pair-rejoin sides), so the lazy form re-derived the embedding
    // construction per consumer — truncating the lineage here computes
    // the embedding ONCE and every consumer scans the checkpointed
    // blocks (the mmrGreedy convention; the wall delta is visible in the
    // r14→r15 closing triplicates: p122 5.36 → 3.38 s, p127 6.51 →
    // 3.55 s — bench_records/r15_close{1,2,3}.json). A 100 TB deployment
    // goes further and
    // persists the embedding frame at ingest (the pqIndex convention).
    "p122_text_embed_neardup" -> ((s, d) =>
      Similarity.nearDupPairs(
        TextStats.hashedEmbedding(docs(s, d), "doc_id", "text").localCheckpoint(),
        "vec_id", "e", minSim = 0.9)),
    // the idf-weighted configs of p121/p122: log2-quantized integer idf
    // down-weights stop-token mass (bench_records/r14_idf_embed.md
    // quotes the precision delta vs the unweighted bootstrap)
    // same localCheckpoint as p121 — the idf build (df join + weighting)
    // is strictly heavier, so the once-not-twice win is larger here
    "p126_text_knn_idf" -> ((s, d) =>
      Similarity.knnBruteForce(
        TextStats.hashedEmbeddingIdf(docs(s, d), "doc_id", "text").localCheckpoint(),
        "vec_id", "e", col("vec_id") < QueryMaxId)),
    // same localCheckpoint as p122 — the idf build is strictly heavier
    // (df join + weighting), so the once-not-six win is larger here
    "p127_text_embed_neardup_idf" -> ((s, d) =>
      Similarity.nearDupPairs(
        TextStats.hashedEmbeddingIdf(docs(s, d), "doc_id", "text").localCheckpoint(),
        "vec_id", "e", minSim = 0.9)),
    // p122 under a deliberately BITING hot-bucket cap (100, the
    // p91/p123 convention): same Auto-planes derivation (sf0.01's 500
    // docs derive 5, sf0.1's 5000 derive 9 — Auto has been the
    // nearDupPairs DEFAULT since round 16, so p122/p127 gate the
    // derivation at the standard cap and this config gates the skip
    // semantics it must coexist with. The oracle replays the derivation
    // itself: p = least(20, greatest(4, length(bin(n−1)) − 4)), the
    // integer-exact ⌈log2(n/16)⌉.
    "p164_text_embed_neardup_auto" -> ((s, d) =>
      Similarity.nearDupPairs(
        TextStats.hashedEmbedding(docs(s, d), "doc_id", "text").localCheckpoint(),
        "vec_id", "e", minSim = 0.9,
        planesPerTable = graft.ops.Adaptive.Auto, maxBucket = 100)),
    "p21_knn_bruteforce" -> ((s, d) =>
      Similarity.knnBruteForce(emb(s, d), "vec_id", "embedding", col("vec_id") < QueryMaxId)),
    // MMR diversity re-rank over p21's exact top-8: the greedy
    // relevance-vs-redundancy selection, unrolled into m=3 declarative
    // stages bounded by |queries|·kCand
    "p160_mmr_rerank" -> ((s, d) =>
      Similarity.mmrRerank(emb(s, d), "vec_id", "embedding", col("vec_id") < QueryMaxId)),
    "p22_knn_lsh" -> ((s, d) =>
      Similarity.knnLsh(emb(s, d), "vec_id", "embedding", col("vec_id") < QueryMaxId)),
    // the OR-construction recall recovery over p22's single table:
    // candidates from ANY of 4 independent 8-plane tables
    "p92_knn_lsh_multi" -> ((s, d) =>
      Similarity.knnLshMulti(emb(s, d), "vec_id", "embedding", col("vec_id") < QueryMaxId)),
    "p38_knn_ivf" -> ((s, d) =>
      Similarity.knnIvf(emb(s, d), "vec_id", "embedding", col("vec_id") < QueryMaxId)),
    // two-level coarse assignment (the production cut past ~10^4 cells):
    // superclusters trained driver-side over the CELL TABLE (the small
    // frame), assignment = one fused nested-argmax node; both tables
    // persist and the oracle replays top-2-supers -> argmax-cell beside
    // the flat argmax, so the agreement column is itself verified.
    "p125_two_level_assign" -> ((s, d) => {
      val e = emb(s, d)
      val nCells = graft.ops.Adaptive.ivfCells(e.count())
      val cents = Similarity.lowestIdCentroids(e, "vec_id", "embedding", nCells)
      val (supers, cellsWithSuper) = Similarity.trainTwoLevel(cents)
      import s.implicits._
      supers.toSeq.toDF("sid", "se").coalesce(1)
        .write.mode("overwrite").parquet(P125SupersPath)
      cellsWithSuper.toSeq.map(c => (c._1, c._2, c._3.toSeq))
        .toDF("cid", "sid", "ce").coalesce(1)
        .write.mode("overwrite").parquet(P125CellsPath)
      e.select(col("vec_id").cast("long").as("vec_id"),
          Similarity.cellOfTwoLevel(col("embedding"), supers, cellsWithSuper, 2)
            .as("cell_two_level"),
          graft.functions.CellArgmax(col("embedding"), cents).as("cell_flat"))
        .withColumn("agree",
          (col("cell_two_level") === col("cell_flat")).cast("long"))
        .orderBy("vec_id")
    }),
    // trained-quantizer IVF. The trainer is pinned by SimilaritySpec's
    // recall test; the SEARCH is oracle-verified value-exactly: the trained
    // centroids are persisted to parquet and the DuckDB oracle replays the
    // identical argmax-assign / probe / top-k against them (p38's oracle
    // with the centroid CTE swapped to read_parquet).
    "p50_knn_ivf_trained" -> ((s, d) =>
      phasedQueries("p50_knn_ivf_trained")._2(s, d, _ => ())),
    // IVF-PQ compressed-index search and PQ recall@5 — phased pipelines
    // like p50; oracles replay encode + ADC against persisted codebooks
    "p105_knn_ivfpq" -> ((s, d) =>
      phasedQueries("p105_knn_ivfpq")._2(s, d, _ => ())),
    "p106_pq_recall" -> ((s, d) =>
      phasedQueries("p106_pq_recall")._2(s, d, _ => ())),
    // residual 8-bit PQ (train on coarse residuals + search / recall) —
    // phased pipelines like p105/p106
    "p109_knn_ivfpq_residual" -> ((s, d) =>
      phasedQueries("p109_knn_ivfpq_residual")._2(s, d, _ => ())),
    "p110_pqr_recall" -> ((s, d) =>
      phasedQueries("p110_pqr_recall")._2(s, d, _ => ())),
    "p118_knn_ivfpq_lut" -> ((s, d) =>
      phasedQueries("p118_knn_ivfpq_lut")._2(s, d, _ => ())),
    "p128_persisted_index_search" -> ((s, d) =>
      phasedQueries("p128_persisted_index_search")._2(s, d, _ => ())),
    "p119_pqr_recall_trained" -> ((s, d) =>
      phasedQueries("p119_pqr_recall_trained")._2(s, d, _ => ())),
    // IVFADC+R: LUT-ADC shortlist + exact re-rank, and its recall rollup
    "p129_knn_ivfpq_rerank" -> ((s, d) =>
      phasedQueries("p129_knn_ivfpq_rerank")._2(s, d, _ => ())),
    "p161_mmr_deployed" -> ((s, d) =>
      phasedQueries("p161_mmr_deployed")._2(s, d, _ => ())),
    "p130_rerank_recall" -> ((s, d) =>
      phasedQueries("p130_rerank_recall")._2(s, d, _ => ())),
    // BPE tokenizer (train + persist merges, row-local apply) — phased
    "p114_bpe_tokenize" -> ((s, d) =>
      phasedQueries("p114_bpe_tokenize")._2(s, d, _ => ())),
    "p117_bpe_budget" -> ((s, d) =>
      phasedQueries("p117_bpe_budget")._2(s, d, _ => ())),
    "p140_token_fertility" -> ((s, d) =>
      phasedQueries("p140_token_fertility")._2(s, d, _ => ())),
    "p144_token_coverage" -> ((s, d) =>
      phasedQueries("p144_token_coverage")._2(s, d, _ => ())),
    "p145_coverage_summary" -> ((s, d) =>
      phasedQueries("p145_coverage_summary")._2(s, d, _ => ())),
    "p146_merge_budget" -> ((s, d) =>
      phasedQueries("p146_merge_budget")._2(s, d, _ => ())),
    "p147_prototypicality" -> ((s, d) =>
      phasedQueries("p147_prototypicality")._2(s, d, _ => ())),
    "p151_quantizer_churn" -> ((s, d) =>
      phasedQueries("p151_quantizer_churn")._2(s, d, _ => ())),
    "p152_semantic_packing" -> ((s, d) =>
      phasedQueries("p152_semantic_packing")._2(s, d, _ => ())),
    "p154_cell_topterms" -> ((s, d) =>
      phasedQueries("p154_cell_topterms")._2(s, d, _ => ())),
    "p159_quantizer_inertia" -> ((s, d) =>
      phasedQueries("p159_quantizer_inertia")._2(s, d, _ => ())),
    // PMI collocation mining (Mikolov et al. 2013 §4): adjacent-bigram
    // phrase candidates ranked by the exact integer PMI ratio
    "p142_collocations" -> ((s, d) =>
      graft.text.TextStats.collocations(docs(s, d), "text")),
    // Heaps'-law vocabulary growth curve: cumulative docs/tokens/types
    // at 10 doc-id prefix checkpoints — the corpus repetitiveness
    // diagnostic; checkpoint math is exact integer arithmetic
    "p148_vocab_growth" -> ((s, d) =>
      graft.text.TextStats.vocabGrowth(docs(s, d), "doc_id", "text")),
    // cross-source contamination matrix: near-dup pair counts per
    // unordered source pair + each cell's share — the "which sources
    // re-crawl each other" audit over the p17 simhash pairs
    "p150_contamination_matrix" -> ((s, d) =>
      TextDedup.contaminationMatrix(docs(s, d), "doc_id", "text", "source")),
    // group-aware leakage-safe split: near-dup groups (p37's components)
    // inherit their representative's hashSplit bucket, so no duplicate
    // pair ever straddles train/test; singletons match p39 exactly
    "p149_group_split" -> ((s, d) => {
      val ds = docs(s, d)
      val groups = TextDedup.duplicateGroups(
        TextDedup.simhashNearDup(ds, "doc_id", "text"), "doc_a", "doc_b")
      TextCuration.groupAwareSplit(ds, "doc_id", "text", groups)
    }),
    // per-document TF-IDF keyword extraction: top-3 characteristic
    // terms per doc under the rational idf surrogate tf·N/df
    "p143_tfidf_keywords" -> ((s, d) =>
      graft.text.TextStats.tfidfKeywords(docs(s, d), "doc_id", "text")),
    // temperature-scaled mixture weights (mT5/UniMax): per-lang token
    // mass and the T=2-tempered sampling share — sqrt is IEEE-correctly-
    // rounded so the shares verify bit-exactly, unlike pow/log configs
    "p120_mixture_weights" -> ((s, d) =>
      TextCuration.mixtureWeights(docs(s, d), "doc_id", "lang", "text")),
    // language-stratified quality gate: keep the top half of each
    // LANGUAGE's quality distribution — the per-language threshold that
    // keeps a global cut from over-filtering low-scoring languages
    "p162_lang_quality_gate" -> ((s, d) =>
      graft.text.TextStats.langQualityGate(docs(s, d), "doc_id", "text", "lang")),
    // UniMax epoch-capped budget allocation (p120's allocation half):
    // budget = 1.5× corpus mass at a 2-epoch cap — chosen so the cap
    // BITES with variance at both scales (the four smaller languages cap,
    // en takes the re-split remainder). The 1-row mass aggregate is the
    // house bounds-collect pattern.
    "p155_unimax_alloc" -> ((s, d) => {
      val ds = docs(s, d)
      val total = ds.agg(sum(org.apache.spark.sql.functions.size(
        graft.functions.TextPrims.tokens(col("text")))).cast("long")).head().getLong(0)
      TextCuration.unimaxAllocation(ds, "doc_id", "lang", "text",
        budgetTokens = total * 3 / 2, maxEpochs = 2L)
    }),
    // mixture sampling keyed by the TRAINED lang-id prediction — the
    // trained-config variant of p96 (heuristic) / p97 (metadata)
    "p116_mixture_trained" -> ((s, d) => {
      val ds = docs(s, d)
      val scored = graft.text.LangClassifier
        .langScorer(ds, "doc_id", "text", "lang")
        .select(col("doc_id").as("id"), col("predicted_lang"))
      val ntok = TextStats.stats(ds, "doc_id", "text")
        .select(col("id"), col("n_tokens"))
      TextCuration.tokenBudgetSample(scored.join(ntok, "id"),
          "id", "predicted_lang", "n_tokens", budget = 4000L)
        .select(col("id"), col("key").as("predicted_lang"),
          col("weight").as("n_tokens"),
          col("cum_weight").as("cum_lang_tokens"))
        .orderBy("id")
    }),
    // ANN quality as an oracle-checked QUERY: recall@k of the LSH and IVF
    // approximate paths against the exact brute-force top-k, one row per
    // method — integer hit counts plus one exact division, so the DuckDB
    // twin (which recomputes all three top-k sets) matches bit-for-bit.
    "p58_ann_recall" -> ((s, d) => {
      val e = emb(s, d)
      // four consumers (hits + possible per method) — materialize the
      // |queries|·k-row exact top-k once (the recallRollup rationale)
      val bf = Similarity.knnBruteForce(e, "vec_id", "embedding",
        col("vec_id") < QueryMaxId).select("query_id", "neighbor_id")
        .localCheckpoint()
      def recallRow(m: DataFrame, name: String): DataFrame = {
        val hits = bf.join(m.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("n_hits"))
        val poss = bf.agg(count(lit(1)).as("n_possible"))
        hits.crossJoin(poss).select(
          lit(name).as("method"), col("n_hits"), col("n_possible"),
          (col("n_hits").cast("double") / col("n_possible")).as("recall_at_k"))
      }
      recallRow(Similarity.knnIvf(e, "vec_id", "embedding",
          col("vec_id") < QueryMaxId), "ivf")
        .unionByName(recallRow(Similarity.knnLsh(e, "vec_id", "embedding",
          col("vec_id") < QueryMaxId), "lsh"))
        .orderBy("method")
    }),
    // the vocabulary-builder staple of a training-data pipeline: corpus
    // term frequency + document frequency per token, top 50 under a
    // deterministic (tf DESC, token ASC) order. Partial hash-agg runs
    // map-side before the token shuffle and the final top-k plans as
    // TakeOrderedAndProject — no global sort of the vocabulary.
    "p61_vocab_top" -> ((s, d) => {
      import org.apache.spark.sql.functions.{countDistinct, explode, desc}
      val toks = docs(s, d).select(col("doc_id"),
        explode(graft.functions.TextPrims.tokens(col("text"))).as("token"))
      toks.groupBy("token")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(desc("tf"), col("token"))
        .limit(50)
    }),
    // corpus curation: deterministic content-hash split/sample (dupes land
    // in the same split; no RNG), PII scrubbing over text augmented with
    // synthetic formula-generated PII (the oracle rebuilds the identical
    // augmentation, so counts and replacements verify value-for-value),
    // Gopher/C4-style repetition heuristics, and n-gram benchmark
    // decontamination with doc_id < 25 standing in as the held-out set.
    "p39_hash_split" -> ((s, d) =>
      TextCuration.hashSplit(docs(s, d), "doc_id", "text")),
    "p40_pii_scrub" -> ((s, d) =>
      TextCuration.piiScrub(piiAugmented(docs(s, d)), "doc_id", "text")),
    "p41_repetition" -> ((s, d) =>
      TextCuration.repetitionStats(docs(s, d), "doc_id", "text")),
    "p42_contamination" -> ((s, d) => {
      val all = docs(s, d)
      TextCuration.contamination(
        all.filter(col("doc_id") >= 25), all.filter(col("doc_id") < 25),
        "doc_id", "text")
    }),
    // p42's direction flip: per benchmark EXAMPLE (doc_id < 25), how much
    // of it leaks from the training corpus — the clean/dirty eval audit;
    // the corpus side is a broadcast semi-probe, it never shuffles
    "p153_eval_dirtiness" -> ((s, d) => {
      val all = docs(s, d)
      TextCuration.evalDirtiness(
        all.filter(col("doc_id") >= 25), all.filter(col("doc_id") < 25),
        "doc_id", "text")
    }),
    // p42's scrubbing counterpart: REMOVE the contaminated spans (doc_id
    // < 25 again stands in as the held-out benchmark) instead of flagging
    // the documents that carry them
    "p90_span_scrub" -> ((s, d) => {
      val all = docs(s, d)
      TextDedup.spanScrub(
        all.filter(col("doc_id") >= 25), all.filter(col("doc_id") < 25),
        "doc_id", "text")
    }),
    "p43_hash_sample" -> ((s, d) =>
      TextCuration.hashSample(docs(s, d), "doc_id", "text")),
    // model-ready sequence prep: overlapping context-window chunks
    // (row-local) and global-cumulative-sum bin packing (distributed
    // prefix sum — never a single-partition window)
    "p81_token_chunks" -> ((s, d) =>
      TextCuration.tokenChunks(docs(s, d), "doc_id", "text")),
    "p82_sequence_packing" -> ((s, d) =>
      TextCuration.sequencePacking(docs(s, d), "doc_id", "text")),
    // deterministic importance sampling: systematic PPS over token mass
    // (integer thresholds on the same distributed prefix sum as p82)
    "p86_pps_sample" -> ((s, d) =>
      TextCuration.ppsSample(docs(s, d), "doc_id", "text", k = 40)),
    // operator COMPOSITION: the curation report a pipeline would emit —
    // lang-id × split × quality-keep × token budget joined on doc id and
    // rolled up. Aggregates are counts and long sums only, so the
    // composed oracle stays value-exact (double means would be
    // summation-order-dependent).
    "p53_curation_summary" -> ((s, d) => {
      val ds = docs(s, d)
      TextStats.langId(ds, "doc_id", "text").select(col("id"), col("predicted_lang"))
        .join(TextCuration.hashSplit(ds, "doc_id", "text").select(col("id"), col("split")), "id")
        .join(TextCuration.repetitionStats(ds, "doc_id", "text").select(col("id"), col("keep")), "id")
        .join(TextStats.stats(ds, "doc_id", "text").select(col("id"), col("n_tokens")), "id")
        .groupBy("predicted_lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
          sum(col("n_tokens")).as("total_tokens"))
        .orderBy("predicted_lang", "split")
    }),
    // IVF index balance profile: per-cell population / id-range / corpus
    // share under the deterministic lowest-id quantizer (the oracle
    // mirrors the same argmax assignment as p38's search).
    "p62_cluster_profile" -> ((s, d) =>
      Similarity.cellProfile(emb(s, d), "vec_id", "embedding")),
    // stratified deterministic sampling: top-3 documents per predicted
    // language under a scrambled-content-hash priority. Reuses the
    // k-bounded TopKAgg heap (priority negated into its (sim DESC, id
    // ASC) order), so each scan task reduces to ≤3 rows per language
    // BEFORE the shuffle — never a per-language window sort, which at
    // 100 TB would funnel a whole language through one task.
    "p63_lang_sample" -> ((s, d) => {
      import graft.functions.TextPrims
      val ds = docs(s, d)
      val lang = TextStats.langId(ds, "doc_id", "text")
        .select(col("id"), col("predicted_lang"))
      val pri = ds.select(col("doc_id").as("id"),
        (TextPrims.charHash(TextPrims.normText(col("text")))
          * lit(2654435761L) % lit(TextPrims.P) % lit(1000000L)).as("priority"))
      lang.join(pri, "id")
        .groupBy("predicted_lang")
        .agg(graft.functions.TopKAgg.topk(
          (col("priority") * -1).cast("double"), col("id"), 3).as("top"))
        .select(col("predicted_lang"), org.apache.spark.sql.functions.posexplode(col("top")))
        .select(col("predicted_lang"),
          (col("pos") + 1).cast("long").as("sample_rank"),
          col("col.neighbor_id").as("id"),
          (col("col.sim") * -1).cast("long").as("priority"))
        .orderBy("predicted_lang", "sample_rank")
    }),
    // corpus length histogram: 100-char buckets with per-bucket counts
    // and token budget — integer DIV on both engines, no float binning.
    "p64_length_histogram" -> ((s, d) =>
      TextStats.stats(docs(s, d), "doc_id", "text")
        .groupBy(org.apache.spark.sql.functions.expr("n_chars div 100").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.min("n_chars").as("min_chars"),
          org.apache.spark.sql.functions.max("n_chars").as("max_chars"),
          sum("n_tokens").as("total_tokens"))
        .orderBy("bucket")),
    // dedup-group profile: per connected component — size, id span, token
    // mass — the report that tells a pipeline how much volume dedup
    // removes per cluster. Composition: pair mining -> CC -> stats join.
    "p65_group_profile" -> ((s, d) => {
      val ds = docs(s, d)
      val groups = TextDedup.duplicateGroups(
        TextDedup.simhashNearDup(ds, "doc_id", "text"), "doc_a", "doc_b")
      val ntok = TextStats.stats(ds, "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"))
      groups.join(ntok, "doc_id")
        .groupBy("group_id")
        .agg(count(lit(1)).as("n_members"),
          org.apache.spark.sql.functions.max("doc_id").as("max_doc_id"),
          sum("n_tokens").as("total_tokens"))
        .orderBy("group_id")
    }),
    // the pipeline CAPSTONE: the whole curation funnel as ONE query —
    // total → exact-dedup keepers → near-dup canonical (simhash pairs
    // mined over the exact keepers, CC, drop non-canonical members) →
    // quality keepers (Gopher–C4 flags) → train/val/test counts. All
    // integer counts, so the DuckDB twin (the same chain as one
    // recursive-CTE statement) verifies the composition end-to-end.
    // The repartition on the keeper frame is the standard exchange-reuse
    // boundary: every later stage references it, and one shuffle stage
    // feeds them all instead of re-running exact dedup per reference.
    "p78_curation_funnel" -> ((s, d) => {
      val ds = docs(s, d)
      val exactKeep = TextDedup.exactDedup(ds, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val kdd = ds.join(exactKeep, "doc_id").repartition(col("doc_id"))
      val dupMembers = TextDedup.duplicateGroups(
          TextDedup.simhashNearDup(kdd, "doc_id", "text"), "doc_a", "doc_b")
        .filter(col("doc_id") =!= col("group_id")).select("doc_id")
      val canon = kdd.join(dupMembers, Seq("doc_id"), "left_anti")
        .repartition(col("doc_id"))
      // localCheckpoint: keepq feeds both the n_quality count and the
      // split join, and unlike kdd/canon (whose trailing repartition
      // exchanges AQE stage-reuse dedupes) it ends row-local — without
      // the boundary the RepetitionStats scan over canon runs twice
      val keepq = TextCuration.repetitionStats(canon, "doc_id", "text")
        .filter(col("keep")).select(col("id").as("doc_id"))
        .localCheckpoint()
      val splits = TextCuration.hashSplit(canon.join(keepq, "doc_id"), "doc_id", "text")
      def c1(df: DataFrame, name: String) = df.agg(count(lit(1)).as(name))
      c1(ds, "n_total")
        .crossJoin(c1(kdd, "n_exact"))
        .crossJoin(c1(canon, "n_canonical"))
        .crossJoin(c1(keepq, "n_quality"))
        .crossJoin(splits.agg(
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test")))
    }),
    // sketch operators — deterministic HLL / Count-Min with value-exact
    // oracles (the exact counts in their outputs are the verification
    // harness; the sketch path is the fixed-size partial-aggregable state)
    "p66_hll_cardinality" -> ((s, d) =>
      graft.text.Sketches.hllShingleCardinality(docs(s, d), "doc_id", "text")),
    // the GROUPED form: one mergeable register table per language — the
    // cube-able sketch pattern (per-key cardinalities from one pass)
    "p163_hll_by_lang" -> ((s, d) =>
      graft.text.Sketches.hllGroupedCardinality(docs(s, d), "doc_id", "text", "lang")),
    "p67_cms_frequency" -> ((s, d) =>
      graft.text.Sketches.cmsTokenFrequency(docs(s, d), "doc_id", "text")),
    // the sketch family's third leg: KMV bottom-k quantile sketch over
    // per-doc token counts, estimates beside their exact rank-select
    // twins (the p66 n_exact convention)
    "p111_quantile_sketch" -> ((s, d) =>
      graft.text.Sketches.kmvQuantiles(docs(s, d), "doc_id", "text")),
    "p23_embedding_neardup" -> ((s, d) =>
      Similarity.nearDupPairs(emb(s, d), "vec_id", "embedding")),
    // cross-modality operator COMPOSITION: connected components over the
    // EMBEDDING near-dup pair graph — the same duplicateGroups engine p37
    // runs on text pairs, fed by the vector miner; the oracle recomputes
    // the p23 pairs and closes them with a recursive CTE (p37's pattern).
    "p59_embedding_dedup_groups" -> ((s, d) =>
      TextDedup.duplicateGroups(
          Similarity.nearDupPairs(emb(s, d), "vec_id", "embedding"),
          "vec_a", "vec_b")
        .select(col("doc_id").as("vec_id"), col("group_id"))),
    // the dedup pipeline's END PRODUCT: the keep-list — every document
    // except non-canonical duplicate-group members (group_id = min member
    // keeps itself). mine pairs → group → anti-join, all one lazy plan.
    "p60_dedup_keep_list" -> ((s, d) => {
      val ds = docs(s, d)
      val dupMembers = TextDedup.duplicateGroups(
          TextDedup.simhashNearDup(ds, "doc_id", "text"), "doc_a", "doc_b")
        .filter(col("doc_id") =!= col("group_id")).select("doc_id")
      ds.select("doc_id").join(dupMembers, Seq("doc_id"), "left_anti")
        .orderBy("doc_id")
    }),
    // the keep-list's smarter sibling: per duplicate group, keep the
    // HIGHEST-QUALITY member (ties → min doc_id), not the min-id one —
    // what a production dedup pipeline actually ships. Groups from the
    // p37 composition, quality from the p18 formula, representative via
    // one max(struct) aggregate (argmax rides the group shuffle the
    // composition already pays; groups are small, no window sort).
    "p89_group_representative" -> ((s, d) => {
      val ds = docs(s, d)
      val groups = TextDedup.duplicateGroups(
        TextDedup.simhashNearDup(ds, "doc_id", "text"), "doc_a", "doc_b")
      val q = TextStats.stats(ds, "doc_id", "text")
        .select(col("id").as("doc_id"), col("quality_score"))
      groups.join(q, Seq("doc_id"))
        .groupBy("group_id")
        .agg(count(lit(1)).as("group_size"),
          max(struct(col("quality_score"), (-col("doc_id")).as("neg"),
            col("doc_id"))).as("best"))
        .select(col("group_id"), col("best.doc_id").as("rep_id"),
          col("best.quality_score").as("rep_quality"),
          col("group_size"),
          (col("group_size") - 1).as("n_discarded"))
        .orderBy("group_id")
    }),
    // multimodal: stats and dedup computed from the REAL binary column;
    // the oracle recomputes from the generating formula — a mismatch at
    // any byte breaks the hash compare.
    "p30_media_stats" -> ((s, d) =>
      graft.multimodal.Media.stats(graft.multimodal.Media.assets(s, d))),
    "p80_frame_windows" -> ((s, d) =>
      graft.multimodal.Media.frameWindowStats(graft.multimodal.Media.assets(s, d))),
    "p31_media_dedup" -> ((s, d) =>
      graft.multimodal.Media.exactFeatureDedup(graft.multimodal.Media.assets(s, d))),
    // perceptual near-dup over the planted-variant corpus: aHash/dHash
    // 16-bit bands, band-blocked candidates, full-Hamming verify — what
    // p31's exact-histogram dedup structurally misses
    "p115_perceptual_neardup" -> ((s, d) =>
      graft.multimodal.Media.perceptualNearDup(
        graft.multimodal.Media.perceptualCorpus(s, d))),
    // the SAME miner under a deliberately degenerate corpus (half the
    // assets share one all-zero aHash bucket): p123 is the capped
    // configuration's pair list, p124 the capped-vs-uncapped pair-count
    // delta proving the hot-bucket cap bites (the p94/p98 convention)
    "p123_perceptual_capped" -> ((s, d) =>
      graft.multimodal.Media.perceptualNearDup(
        graft.multimodal.Media.degenerateCorpus(s, d), maxHamming = 6,
        maxBucket = 100)),
    "p124_perceptual_cap_bite" -> ((s, d) =>
      graft.multimodal.Media.perceptualCapBite(
        graft.multimodal.Media.degenerateCorpus(s, d), maxHamming = 6,
        maxBucket = 100)),
    // DCT pHash (Zauner's published recipe, fixed-point basis) over the
    // dither-augmented corpus — the hash table itself, bit-for-bit
    "p167_phash_table" -> ((s, d) =>
      graft.multimodal.Media.phashes(
        graft.multimodal.Media.ditherCorpus(s, d)).orderBy("asset_id")),
    // the robustness fixture: planted checkerboard-dither pairs the
    // aHash miner provably misses (Hamming > 6) and pHash recovers
    "p168_phash_recovery" -> ((s, d) =>
      graft.multimodal.Media.phashRecovery(
        graft.multimodal.Media.ditherCorpus(s, d))))
}
