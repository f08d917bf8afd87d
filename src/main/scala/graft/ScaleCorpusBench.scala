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
    // heap: the 100×/30M rungs want SPARK_DRIVER_MEM ≥ 32g (see DevBench)
    val spark = DevBench.session()
    import graft.text.{TextCuration, TextDedup}

    for (n <- docSizes) {
      val corpus = synthCorpus(spark, n).persist()
      corpus.count()
      val exact = time(mat(TextDedup.exactDedup(corpus, "doc_id", "text")))
      val minhash = time(mat(TextDedup.minhashNearDup(corpus, "doc_id", "text")))
      val ngramCap = time(mat(TextDedup.ngramJaccardPairs(
        corpus, "doc_id", "text", TextDedup.MaxDf(64))))
      val packing = time(mat(TextCuration.sequencePacking(corpus, "doc_id", "text")))
      val span = time(mat(TextDedup.spanDedup(corpus, "doc_id", "text")))
      corpus.unpersist(false)
      println(s"""{"op":"exact_dedup","docs":$n,"sec":${f"$exact%.2f"}}""")
      println(s"""{"op":"minhash_neardup","docs":$n,"sec":${f"$minhash%.2f"}}""")
      println(s"""{"op":"ngram_jaccard_df64","docs":$n,"sec":${f"$ngramCap%.2f"}}""")
      println(s"""{"op":"sequence_packing","docs":$n,"sec":${f"$packing%.2f"}}""")
      println(s"""{"op":"span_dedup","docs":$n,"sec":${f"$span%.2f"}}""")
    }

    // CC: 1M / 10M edges take the single-task union-find path (≤ the 10M
    // threshold); 30M takes the iterative min-label loop — both sides of
    // the adaptive switch appear in the curve
    val edgeSizes = Seq(1000000L, 10000000L, 30000000L)
    for (n <- edgeSizes) {
      val edges = synthEdges(spark, n).persist()
      edges.count()
      val cc = time(mat(TextDedup.duplicateGroups(edges, "doc_a", "doc_b")))
      edges.unpersist(false)
      println(s"""{"op":"dedup_groups_cc","edges":$n,"sec":${f"$cc%.2f"}}""")
    }

    // ranged as-of (p44 shape): 3 keys, snapshots every 100th tick,
    // adaptive range count (the operator's new default)
    val asofSizes = Seq(1000000L, 10000000L, 100000000L)
    for (n <- asofSizes) {
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
