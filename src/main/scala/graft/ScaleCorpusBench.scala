package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement harness for the ITERATIVE / corpus-shaped operators the
  * round-7 verdict flagged as "argued, never measured past sf0.1":
  * connected-components dedup groups (p37 family), exact dedup (p13),
  * MinHash-LSH near-dup (p14), df-capped n-gram Jaccard (p15b), sequence
  * packing (p82), and the ranged as-of join (p44) — each timed on
  * deterministic synthetic inputs at ~1×/10×/100× of sf0.1's volume
  * (sf0.1 = 5 000 docs × ~300 chars; 100 TB is farther still, but the
  * CURVE — how cost bends with n — is what the sandbox can measure).
  *
  * Synthetic on purpose, like [[ScaleBench]]: the real sf dirs stop at
  * 5 000 docs, and the operators' cost drivers (duplicate rate, shingle
  * cardinality, component structure, rows per key) are controlled
  * explicitly here. All generation is expression-only (no driver loops)
  * and each input is persisted + counted before timing so every figure is
  * pure operator compute.
  *
  * Run: `sbt "runMain graft.ScaleCorpusBench"` (or pass doc counts).
  * One JSON line per (op, size); curves land in bench_records/.
  */
object ScaleCorpusBench {

  import DevBench.{time, mat}

  /** Synthetic corpus with sf0.1's shape (≈300-char docs, heavy exact +
    * near duplicate structure): per 10-doc block, docs x0–x6 and x9 are
    * unique, x7 is an EXACT duplicate of x0, and x8 is a NEAR duplicate
    * of x0 (every 17th token replaced) — so exact-dup rate 10% and
    * near-dup rate 10% hold at every size, token vocabulary is a fixed
    * 5 000 (shingle df grows with n, stressing the df-cap exactly as a
    * real corpus would), and doc lengths vary 50–149 tokens. */
  def synthCorpus(spark: SparkSession, n: Long): DataFrame = {
    val seed = when(pmod(col("id"), lit(10)).isin(7, 8),
      expr("(id div 10) * 10")).otherwise(col("id")).cast("long")
    val perturb = pmod(col("id"), lit(10)) === 8
    spark.range(n).select(col("id").as("doc_id"),
        seed.as("__s"), perturb.as("__p"))
      .select(col("doc_id"), array_join(expr(
        // token k of doc seed s: "w" ++ hash(s·1000003 + k) mod 5000;
        // near-dups swap every 17th token for a doc-unique one
        "transform(sequence(0, 49 + pmod(hash(__s), 100)), k -> " +
          "concat('w', CAST(pmod(hash(__s * 1000003L + k), 5000) AS STRING)) || " +
          "IF(__p AND k % 17 = 3, concat('x', CAST(pmod(hash(doc_id * 31L + k), 99989) AS STRING)), ''))"),
        " ").as("text"))
  }

  /** Web-shaped twin of [[synthCorpus]]: same duplicate structure and
    * lengths, but tokens drawn ZIPFIAN from a 50 000-word vocabulary
    * (rank = floor(V^u) for uniform u — P(rank) ∝ 1/rank, the standard
    * log-uniform inverse-CDF) instead of uniformly from 5 000. Real text
    * is Zipfian; the uniform corpus inflates mid-frequency n-gram df
    * (every token equally common → every trigram moderately common),
    * making df-capped operators look pessimistic and the cap's effect
    * unrealistic. The ladder runs BOTH so the 100× numbers bracket real
    * data (round-8 verdict item 7). */
  def synthCorpusZipf(spark: SparkSession, n: Long,
                      vocab: Int = 50000): DataFrame = {
    val seed = when(pmod(col("id"), lit(10)).isin(7, 8),
      expr("(id div 10) * 10")).otherwise(col("id")).cast("long")
    val perturb = pmod(col("id"), lit(10)) === 8
    spark.range(n).select(col("id").as("doc_id"),
        seed.as("__s"), perturb.as("__p"))
      .select(col("doc_id"), array_join(expr(
        // uniform u ∈ (0,1) from the token's hash; rank = floor(V^u)
        "transform(sequence(0, 49 + pmod(hash(__s), 100)), k -> " +
          s"concat('z', CAST(CAST(pow($vocab.0, " +
          "(pmod(hash(__s * 1000003L + k), 1000000) + 0.5) / 1000000.0) AS BIGINT) AS STRING)) || " +
          "IF(__p AND k % 17 = 3, concat('x', CAST(pmod(hash(doc_id * 31L + k), 99989) AS STRING)), ''))"),
        " ").as("text"))
  }

  /** Synthetic pair graph with controlled component structure: per
    * 100-edge block, edges 1–89 star onto the block hub, 90–98 chain off
    * the star's rim, and edge 99 glues the block's hub to the NEXT
    * block's hub — except on every 10th block, which ends its run: the
    * components are ~1 000-node fusions of 10 blocks whose COUNT grows
    * with n while their diameter stays constant, the shape of a real
    * near-dup graph (many bounded clusters). The 10M-edge
    * union-find/iterative switch is crossed by the size ladder. */
  def synthEdges(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    val inBlock = pmod(id, lit(100))
    val hub = expr("(id div 100) * 100")
    // run-ending blocks (b % 10 == 9) keep their rim chain edge instead
    // of gluing forward, so runs of 10 blocks stay separate components
    val glue = inBlock === 99 && expr("pmod(id div 100, 10)") =!= 9
    spark.range(1L, n + 1).select(
      when(inBlock < 90, hub)
        .when(glue, hub)
        .otherwise(id - 1).as("doc_a"),
      when(inBlock < 90, id)
        .when(glue, id + 1)
        .otherwise(id).as("doc_b"))
  }

  def main(args: Array[String]): Unit = {
    val docSizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                   else Seq(5000L, 50000L, 500000L)
    // SPARK_GRAFT_OPS=ngram,cc limits the run to op-name prefixes — a
    // targeted-rung aid (e.g. the p15b prefix-vs-counting decision at
    // 500k) so one comparison doesn't pay the whole ladder. Unset = all.
    val opsFilter = sys.env.get("SPARK_GRAFT_OPS").map(_.split(",").toSeq)
    def opOn(op: String) = opsFilter.forall(_.exists(op.startsWith))
    // SPARK_GRAFT_CORPUS=zipf50k similarly targets one ladder corpus
    val corpusFilter = sys.env.get("SPARK_GRAFT_CORPUS")
    // heap: the 100×/30M rungs want SPARK_DRIVER_MEM ≥ 32g (see DevBench)
    val spark = DevBench.session()
    import graft.text.{TextCuration, TextDedup}

    // every op the doc-corpus block can report: when SPARK_GRAFT_OPS selects
    // none of them (e.g. a targeted dedup_groups_cc/asof_ranged rung), skip
    // synthesizing and persisting the corpora entirely (round-11 advice —
    // targeted rungs were paying the full corpus-build cost for zero reports)
    val corpusOps = Seq("exact_dedup", "minhash_neardup", "ngram_jaccard_df64",
      "ngram_jaccard_df64_prefix", "sequence_packing", "span_dedup",
      "span_scrub", "bigram_novelty", "group_representative",
      "lm_surprisal", "scoped_dedup", "winnowing_pairs")
    for (n <- docSizes if corpusOps.exists(opOn)) {
      for ((cname, gen) <- Seq(
          "uniform5k" -> synthCorpus(spark, n),
          "zipf50k" -> synthCorpusZipf(spark, n))
          if corpusFilter.forall(_ == cname)) {
        val corpus = gen.persist()
        corpus.count()
        def report(op: String, sec: => Double): Unit = if (opOn(op)) println(
          s"""{"op":"$op","corpus":"$cname","docs":$n,"sec":${f"${sec}%.2f"}}""")
        report("exact_dedup",
          time(mat(TextDedup.exactDedup(corpus, "doc_id", "text"))))
        report("minhash_neardup",
          time(mat(TextDedup.minhashNearDup(corpus, "doc_id", "text"))))
        report("ngram_jaccard_df64", time(mat(TextDedup.ngramJaccardPairs(
          corpus, "doc_id", "text", TextDedup.MaxDf(64)))))
        // the prefix-filtered twin at the same cap — identical output
        // (spec-pinned), different candidate generation; the ladder is
        // where the counting-vs-prefix winner is decided
        report("ngram_jaccard_df64_prefix", time(mat(TextDedup.ngramJaccardPrefix(
          corpus, "doc_id", "text", TextDedup.MaxDf(64)))))
        report("sequence_packing",
          time(mat(TextCuration.sequencePacking(corpus, "doc_id", "text"))))
        report("span_dedup",
          time(mat(TextDedup.spanDedup(corpus, "doc_id", "text"))))
        // round-9 additions (r8 verdict item 6): the p88/p89/p90 family.
        // span scrub: benchmark = every 20th doc (~5%), the held-out-set
        // shape; novelty: the fused p88 query (train split inside)
        report("span_scrub", time(mat(TextDedup.spanScrub(
          corpus, corpus.filter(pmod(col("doc_id"), lit(20)) === 0),
          "doc_id", "text"))))
        report("bigram_novelty",
          time(mat(graft.text.TextStats.bigramNovelty(corpus, "doc_id", "text"))))
        // r14 additions: the p138 LM scorer (train split inside, one
        // frozen model exchange) and the p141 scope report (one hash-only
        // occurrence exchange; scope = 20-way synthetic source split)
        report("lm_surprisal",
          time(mat(graft.text.TextStats.lmSurprisal(corpus, "doc_id", "text"))))
        // r14 addition: the p158 winnowing miner at the shipped cap-16 —
        // the fingerprint index is ~1/w of the gram index, so its curve
        // should sit well under ngram_jaccard's at every rung
        report("winnowing_pairs", time(mat(TextDedup.winnowingPairs(
          corpus, "doc_id", "text", TextDedup.MaxDf(16)))))
        report("scoped_dedup", time(mat(TextDedup.scopedDedupReport(
          corpus.withColumn("source",
            concat(lit("s"), pmod(col("doc_id"), lit(20)).cast("string"))),
          "doc_id", "text", "source"))))
        // representative (p89): time the NEW stage — the argmax riding
        // the group shuffle — over precomputed groups/quality, so the
        // figure isn't dominated by the already-laddered simhash+CC
        if (opOn("group_representative")) {
          val groups = TextDedup.duplicateGroups(
            TextDedup.simhashNearDup(corpus, "doc_id", "text"),
            "doc_a", "doc_b").persist()
          val quality = graft.text.TextStats.stats(corpus, "doc_id", "text")
            .select(col("id").as("doc_id"), col("quality_score")).persist()
          groups.count(); quality.count()
          report("group_representative", time(mat(
            groups.join(quality, Seq("doc_id"))
              .groupBy("group_id")
              .agg(count(lit(1)).as("group_size"),
                max(struct(col("quality_score"), (-col("doc_id")).as("neg"),
                  col("doc_id"))).as("best"))
              .select(col("group_id"), col("best.doc_id").as("rep_id"),
                col("group_size")))))
          groups.unpersist(false); quality.unpersist(false)
        }
        corpus.unpersist(false)
      }
    }

    // CC: 1M / 10M edges take the single-task union-find path (≤ the 10M
    // threshold); 30M takes the iterative min-label loop — both sides of
    // the adaptive switch appear in the curve
    val edgeSizes = Seq(1000000L, 10000000L, 30000000L)
    for (n <- edgeSizes if opOn("dedup_groups_cc")) {
      val edges = synthEdges(spark, n).persist()
      edges.count()
      val cc = time(mat(TextDedup.duplicateGroups(edges, "doc_a", "doc_b")))
      edges.unpersist(false)
      println(s"""{"op":"dedup_groups_cc","edges":$n,"sec":${f"$cc%.2f"}}""")
    }

    // ranged as-of (p44 shape): 3 keys, snapshots every 100th tick,
    // adaptive range count (the operator's new default)
    val asofSizes = Seq(1000000L, 10000000L, 100000000L)
    for (n <- asofSizes if opOn("asof_ranged")) {
      val left = spark.range(n).select(
        concat(lit("lot"), pmod(col("id"), lit(3)).cast("string")).as("key"),
        (col("id") / 3).as("t"), col("id").as("left_id")).persist()
      val right = spark.range(0L, n, 100L).select(
        concat(lit("lot"), pmod(col("id"), lit(3)).cast("string")).as("key"),
        (col("id") / 3).as("rt"), (col("id") * 7).as("payload")).persist()
      left.count(); right.count()
      val asof = time(mat(graft.ops.AsOfJoin.asOfRanged(
        left, right, Seq("key"), "t", "rt", Seq("payload"))))
      left.unpersist(false); right.unpersist(false)
      println(s"""{"op":"asof_ranged","rows":$n,"sec":${f"$asof%.2f"}}""")
    }
    spark.stop()
  }
}
