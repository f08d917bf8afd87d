package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key quantiles by BUCKETED rank selection — the scalable form
  * of "the value at ascending rank max(1, ceil(q·n))" (1-based, the lower
  * discrete quantile). A plain `row_number() over (partition by key)` rank
  * selection sorts each key's ENTIRE history in one task: parallelism =
  * key cardinality, the same low-cardinality scale-killer class
  * [[AsOfJoin.asOfRanged]] and [[RangedWindow]] exist for.
  *
  * Plan: (1) one tiny per-key min/max aggregate fixes each key's value
  * range; (2) rows bin row-locally by value — the bin map is MONOTONE, so
  * equal values share a bin and bin order = value order; (3) the
  * per-(key, bin) histogram (a keys × buckets table) locates, per
  * quantile, the single bin containing the global target rank and the
  * residual in-bin rank; (4) row_number ranks ONLY inside target bins —
  * partitions of ~n/buckets rows with keys × quantiles-way parallelism.
  * Exactness: with c values in bins below the target bin, the value at
  * in-bin ascending rank (r − c) IS the value at global rank r
  * (monotonicity), and in-bin ties don't matter — any order of equal
  * values puts the same VALUE at a given rank. Worst case (all of a key's
  * values equal) collapses to one bin = the plain single sort, never
  * worse. Values must be non-null numerics.
  */
object Percentiles {

  /** One row per (key, quantile): `(key, q, <value col> = the selected
    * value, n = the key's row count)`. `quantiles` must be in (0, 1].
    * `numBuckets` defaults to [[Adaptive.Auto]]: derived from the LARGEST
    * key's row count (floor 64 — the round-7 fixed default — growing past
    * [[Adaptive.RowsPerRange]] rows per bucket), so the in-bin sorts stay
    * bounded as the biggest key grows. Result-invariant for any value
    * (PercentilesSpec pins bucketed ≡ plain window). */
  def exactRankSelect(df: DataFrame, key: String, value: String,
                      quantiles: Seq[Double],
                      numBuckets: Int = Adaptive.Auto): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall(q => q > 0 && q <= 1), "quantiles must be in (0, 1]")
    require(numBuckets >= 0, "numBuckets must be >= 1, or Adaptive.Auto (0)")
    // ONE keys-sized aggregate, COLLECTED (keys are low-cardinality by
    // this operator's charter, and the guarded collect fetches at most
    // cap + 1 rows, so a charter violation is a clear error, never a
    // driver OOM): the rows feed the bin map back as a broadcast local
    // table — so the bounds scan never re-executes — and the largest
    // key's count feeds the Auto bucket derivation without a second
    // aggregation job over df.
    val spark = df.sparkSession
    // localCheckpoint: this operator executes its input THREE times (the
    // bounds collect below, then `binned` once per consumer — histogram
    // and target-bin join). The input contract is a narrow (key, value)
    // frame, but callers feed DERIVED frames (p52: the session-pairing
    // window; p139/p162: trained scorer outputs), so one materialization
    // beats three derivations. NOTE this is not the round-8 repartition
    // experiment (5.9 → 33 s at 10M rows): that routed every row through
    // an extra SHUFFLE; a local checkpoint materializes the computed
    // partitions in place with no exchange.
    val dfCk = df.localCheckpoint()
    val boundRows = Adaptive.boundedCollect(
      dfCk.groupBy(key)
        .agg(min(value).as("__lo"), max(value).as("__hi"), count(lit(1)).as("__n")),
      s"exactRankSelect key cardinality (column '$key')",
      "the plain window form: row_number() over (partition by key order " +
        "by value) against rank ceil(q*n), or approx percentile_approx")
    val nBuckets =
      if (numBuckets != Adaptive.Auto) numBuckets
      else Adaptive.numRanges(
        if (boundRows.isEmpty) 0L
        else boundRows.map(_.getLong(3)).max, floor = 64) // __n is column 3
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val bSchema = StructType(Seq(df.schema(key),
      StructField("__lo", df.schema(value).dataType),
      StructField("__hi", df.schema(value).dataType),
      StructField("__n", LongType)))
    val bounds = spark.createDataFrame(
      java.util.Arrays.asList(boundRows: _*), bSchema).drop("__n")
    // monotone value→bin map: floor((v−lo)·B / (hi−lo+1)) ∈ [0, B−1].
    // All arithmetic in DOUBLE from the start: computing v−lo or hi−lo+1
    // in the value's integer type first would overflow on a key whose
    // range exceeds Long.MaxValue (e.g. raw hash values spanning the full
    // long range) and silently break monotonicity. The double cast itself
    // is monotone (ties may share a bin past 2^53 — harmless, bins only
    // need monotone non-decreasing).
    // binned is DELIBERATELY evaluated by both consumers below (the
    // histogram groupBy and the target-bin join) rather than routed
    // through a shared repartition: the histogram shuffles only map-side
    // partials and the join side is broadcast-joined with no shuffle at
    // all, so a repartition "reuse" exchange would shuffle every row to
    // save two cheap scans — measured 5.9 s → 33 s at 10M rows when
    // tried (round 8). Scans are cheap; full-data shuffles are not.
    val binned = dfCk.join(broadcast(bounds), key)
      .withColumn("__bin", least(lit(nBuckets - 1), floor(
        (col(value).cast("double") - col("__lo").cast("double")) * nBuckets /
          (col("__hi").cast("double") - col("__lo").cast("double") + 1.0))).cast("int"))
      .select(col(key), col(value), col("__bin"))
    val wKey = Window.partitionBy(key)
    val hist = binned.groupBy(col(key), col("__bin"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(wKey.orderBy("__bin")))
      .withColumn("n", sum("__c").over(wKey))
    // per (key, quantile): the target rank, its bin, the in-bin residual
    val targets = hist
      .select(col(key), col("__bin"), col("__c"), col("__cum"), col("n"),
        explode(array(quantiles.map(lit): _*)).as("q"))
      .withColumn("__r", greatest(lit(1), ceil(col("q") * col("n"))).cast("long"))
      .filter(col("__cum") - col("__c") < col("__r") && col("__r") <= col("__cum"))
      .select(col(key), col("__bin"), col("q"), col("n"),
        (col("__r") - (col("__cum") - col("__c"))).as("__rk"))
    // each (key, q) names exactly one bin, so this window's partitions
    // hold one bin's rows — the bounded sort the whole plan exists for
    val wBin = Window.partitionBy(col(key), col("q")).orderBy(value)
    binned.join(broadcast(targets), Seq(key, "__bin"))
      .withColumn("__rn", row_number().over(wBin))
      .filter(col("__rn") === col("__rk"))
      .select(col(key), col("q"), col(value), col("n"))
  }
}
