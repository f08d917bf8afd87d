package graft

import org.apache.spark.sql.functions._

/** Dev measurement harness for the round-14 BPE conversion: train wall
  * vs MERGE COUNT (the axis the round-13 verdict flagged — the
  * distributed loop pays one Spark job per merge, so its wall is
  * ~nMerges × scheduler floor regardless of data size), and apply wall
  * for the fused expression vs the nMerges-deep replace-fold chain.
  *
  * The corpus is [[ScaleCorpusBench.synthCorpusZipf]] (web-shaped token
  * distribution, 50k vocabulary) so the merge ladder has enough pair
  * diversity to sustain ≥1000 merges — the real sf dirs' synthetic text
  * is too lexically narrow for deep merge tables.
  *
  * Run: `sbt "runMain graft.BpeLadderBench [nDocs]"`. One JSON line per
  * measurement; curves land in bench_records/r14_bpe_ladder.md.
  */
object BpeLadderBench {

  import DevBench.{time, mat}

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(5000L)
    val spark = DevBench.session()
    val docs = ScaleCorpusBench.synthCorpusZipf(spark, nDocs).persist()
    docs.count()

    val vocab = graft.text.BpeTokenizer.vocabulary(docs, "text").persist()
    val nVocab = vocab.count()
    val tCollect = time {
      vocab.select("word", "freq").collect()
    }
    val vocabRows = vocab.select("word", "freq").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    println(s"""{"op":"bpe_vocab","n_docs":$nDocs,"n_vocab":$nVocab,""" +
      s""""collect_sec":${f"$tCollect%.3f"}}""")

    // driver-side trainer ladder: wall must be sublinear in merges
    // relative to the distributed loop's per-merge job floor
    for (m <- Seq(40, 200, 1000, 4000)) {
      var merges: Seq[graft.text.BpeTokenizer.Merge] = Nil
      val t = time { merges = graft.text.BpeTokenizer.trainMergesLocal(vocabRows, m) }
      println(s"""{"op":"bpe_train_local","n_merges":$m,""" +
        s""""trained":${merges.length},"sec":${f"$t%.3f"}}""")
      // fused apply over the corpus with this table: plan is ONE node
      // whatever the merge count
      val tApply = time {
        mat(graft.text.BpeTokenizer.tokenize(docs, "doc_id", "text", merges))
      }
      println(s"""{"op":"bpe_apply_fused","n_merges":${merges.length},""" +
        s""""sec":${f"$tApply%.3f"}}""")
      // the replace-fold chain for comparison — only at depths where the
      // plan still analyzes/compiles in reasonable time
      if (m <= 200) {
        val tChain = time {
          mat(graft.text.BpeTokenizer.tokenizeSpec(docs, "doc_id", "text", merges))
        }
        println(s"""{"op":"bpe_apply_chain","n_merges":${merges.length},""" +
          s""""sec":${f"$tChain%.3f"}}""")
      }
    }

    // distributed trainer floor: per-merge job cost at a depth where the
    // loop is tolerable; multiply out for the 32k production quote
    val tDist = time { graft.text.BpeTokenizer.trainMergesDistributed(vocab, 40) }
    println(s"""{"op":"bpe_train_distributed","n_merges":40,""" +
      s""""sec":${f"$tDist%.3f"},"sec_per_merge":${f"${tDist / 40}%.4f"}}""")

    spark.stop()
  }
}
