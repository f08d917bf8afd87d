package graft

import org.apache.spark.sql.functions._

/** Dev measurement for the p152 semantic-packing funnel fix: a DEGENERATE
  * quantizer that collapses the corpus into ONE cell used to push the
  * whole corpus through a single window partition; the two-level
  * (cell, id-range-bucket) prefix sum bounds any partition at
  * corpus/numRanges rows. This harness times both shapes — `numRanges=1`
  * reproduces the old funnel exactly (one bucket ≡ one partition per
  * cell), `Auto` is the shipped decomposition — on an all-one-cell corpus
  * with near-free tokenization (constant three-token docs), so the
  * measured delta is pure prefix-sum topology, not text work.
  *
  * Run: `sbt "runMain graft.ScalePackFunnelBench"` (or pass row counts).
  * One JSON line per (shape, rows); curves land in bench_records/.
  */
object ScalePackFunnelBench {

  import DevBench.{time, mat}

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 4000000L, 16000000L)
    val spark = DevBench.session()
    import graft.text.TextCuration

    sizes.foreach { n =>
      val docs = spark.range(n)
        .select(col("id").as("doc_id"), lit("w w w").as("text"))
        .persist()
      val cells = spark.range(n)
        .select(col("id").as("vec_id"), lit(0L).as("cell"))
        .persist()
      docs.count(); cells.count()
      Seq("funnel" -> 1, "two_level" -> graft.ops.Adaptive.Auto).foreach {
        case (shape, nr) =>
          val s = time(mat(TextCuration.semanticPacking(
            docs, "doc_id", "text", cells, budgetTokens = 512L,
            numRanges = nr)))
          println(s"""{"op":"semantic_packing_$shape","rows":$n,"sec":$s}""")
      }
      docs.unpersist(false); cells.unpersist(false)
    }
    spark.stop()
  }
}
