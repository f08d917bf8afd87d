package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end rehearsal of the FULL production curation chain — exact
  * dedup → near-dup CC canonicalization → benchmark decontamination →
  * PII scrub → Gopher quality gate → mixture sampling → hash splits —
  * at corpus sizes past the per-operator ladders (round-14 verdict item
  * 2 established the core funnel; round-16 item 5 added the three
  * stages a production pipeline also runs). Unlike the p78 QUERY (one
  * lazy composition, correct for the oracle's integer counts), the
  * rehearsal materializes each stage through the noop sink behind a
  * persist boundary, so the per-stage walls, task-skew ratios, and
  * shuffle/spill bytes are attributable to exactly one stage.
  *
  * Corpus: [[ScaleCorpusBench.synthCorpus]] (10% exact + 10% near dups,
  * 50–149 tokens/doc) — the same generator the per-operator ladders use,
  * so a stage's figure here is directly comparable to its solo rung.
  * `SPARK_GRAFT_CORPUS=zipf50k` switches to the Zipfian twin.
  *
  * Run: `sbt "runMain graft.FunnelBench [docCounts...]"` with
  * SPARK_DRIVER_MEM sized to the rung (48g for the 10M rehearsal).
  * One JSON line per (stage, size); records land in bench_records/.
  */
object FunnelBench {

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 10000000L)
    val spark = DevBench.session()
    import graft.text.{TextCuration, TextDedup}

    val cname = sys.env.getOrElse("SPARK_GRAFT_CORPUS", "uniform5k")
    for (n <- sizes) {
      val gen = cname match {
        case "zipf50k" => ScaleCorpusBench.synthCorpusZipf(spark, n)
        case _         => ScaleCorpusBench.synthCorpus(spark, n)
      }
      val ds = gen.persist()
      ds.count()

      def stage(name: String)(f: => DataFrame): DataFrame = {
        val (wall, df, snap) = TaskStats.scoped(spark) {
          val d = f.persist(); d.count(); d
        }
        println(s"""{"op":"funnel_$name","corpus":"$cname","docs":$n,""" +
          s""""sec":${f"$wall%.2f"},"rows":${df.count()},${snap.json}}""")
        df
      }

      // Stage 1: exact dedup — keep-lowest-id per full-text hash.
      val exactKeep = stage("exact_dedup") {
        TextDedup.exactDedup(ds, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
      }
      // Stage 2: the keeper frame, repartitioned by doc_id — the
      // exchange-reuse boundary every later stage reads (p78's shape).
      val kdd = stage("keeper_join") {
        ds.join(exactKeep, "doc_id").repartition(col("doc_id"))
      }
      // Stage 3: the banded simhash miner over the keepers — the
      // funnel's dominant cost at every rung of the solo ladder.
      val pairs = stage("simhash_pairs") {
        TextDedup.simhashNearDup(kdd, "doc_id", "text")
      }
      // Stage 4: connected components over the pair graph → non-canonical
      // members (everyone but the group minimum).
      val dupMembers = stage("cc_members") {
        TextDedup.duplicateGroups(pairs, "doc_a", "doc_b")
          .filter(col("doc_id") =!= col("group_id")).select("doc_id")
      }
      // Stage 5: canonical corpus = keepers minus non-canonical members.
      val canon = stage("canonical_antijoin") {
        kdd.join(dupMembers, Seq("doc_id"), "left_anti")
          .repartition(col("doc_id"))
      }
      // Stage 5b (round 16 — the FULL production chain): benchmark
      // decontamination. The held-out set is the corpus's first 1000
      // docs — tiny like a real eval suite, and guaranteed overlapping
      // (each is the seed of a dup family), so the span removal BITES.
      // The benchmark vocabulary broadcasts; the corpus never shuffles
      // for the probe (the p90 contract).
      val bench = ds.filter(col("doc_id") < 1000)
        .select("doc_id", "text").persist()
      bench.count()
      val decon = stage("decontam_scrub") {
        graft.text.TextDedup.spanScrub(
            canon.select("doc_id", "text"), bench, "doc_id", "text")
          .select(col("doc_id"), col("cleaned_text").as("text"))
      }
      // Stage 5c: PII scrub — pattern counts + sequential replacement on
      // the decontaminated text (row-local regex; the stage exists here
      // to catch an interpreted-eval straggler like the r15 quality gate).
      val pii = stage("pii_scrub") {
        TextCuration.piiScrub(decon, "doc_id", "text")
          .select(col("id").as("doc_id"), col("clean_text").as("text"))
      }
      // Stage 6: the Gopher repetition/quality gate, on the cleaned text.
      val keepq = stage("quality_gate") {
        TextCuration.repetitionStats(pii, "doc_id", "text")
          .filter(col("keep")).select(col("id").as("doc_id"))
      }
      // Stage 6b: mixture sampling — per-source token budgets filled in
      // id order via the keyed distributed prefix sum (p96's shape; a
      // per-source Window over raw rows would funnel a dominant source
      // through one task). Source key = doc_id mod 5; the budget is
      // sized to BITE on the post-gate mass (~8% of n docs survive the
      // dup stages on this corpus, ~100 tokens each → ~1.6·n tokens per
      // source; budget n takes ~60%).
      val mix = stage("mixture_sample") {
        val keyed = pii.join(keepq, "doc_id")
          .select(col("doc_id"),
            concat(lit("src"), pmod(col("doc_id"), lit(5))).as("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        TextCuration.tokenBudgetSample(keyed, "doc_id", "source",
            "n_tokens", budget = n)
          .select(col("id").as("doc_id"))
      }
      // Stage 7: hash split counts — the funnel's terminal aggregate,
      // over the mixture-selected cleaned docs.
      val (wall7, splitRow, snap7) = TaskStats.scoped(spark) {
        TextCuration.hashSplit(pii.join(mix, "doc_id"), "doc_id", "text")
          .groupBy("split").agg(count(lit(1)).as("c"))
          .orderBy("split").collect()
      }
      val splitStr = splitRow.map(r => s""""${r.getString(0)}":${r.getLong(1)}""")
        .mkString(",")
      println(s"""{"op":"funnel_split","corpus":"$cname","docs":$n,""" +
        s""""sec":${f"$wall7%.2f"},$splitStr,${snap7.json}}""")

      Seq(exactKeep, kdd, pairs, dupMembers, canon, bench, decon, pii,
          keepq, mix, ds)
        .foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
