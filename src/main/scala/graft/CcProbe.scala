package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the distributed connected-components loop in isolation:
  * forces the ITERATIVE path (`localEdgeThreshold = 0`) on a synthetic
  * pair graph regardless of size, so the loop's cost can be measured
  * without the union-find path absorbing the rung. Companion to
  * [[ScaleCorpusBench]] (which measures the adaptive operator as shipped);
  * this probe is how the round-8 delta-iteration experiment was priced
  * (see bench_records/r8_scaling.md — measured slower, reverted).
  *
  * Usage: `SPARK_DRIVER_MEM=32g sbt "runMain graft.CcProbe 30000000"`.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = DevBench.session()
    val n = args.headOption.map(_.toLong).getOrElse(30000000L)
    val edges = ScaleCorpusBench.synthEdges(spark, n).persist()
    edges.count()
    val t0 = System.nanoTime()
    val g = text.TextDedup.duplicateGroups(edges, "doc_a", "doc_b",
      localEdgeThreshold = 0L)
    g.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"""{"op":"cc_iterative","edges":$n,"sec":$dt%.2f,"rounds":${text.TextDedup.lastRounds}}""")
    spark.stop()
  }
}
