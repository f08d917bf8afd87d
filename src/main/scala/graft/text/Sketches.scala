package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash
import graft.functions.TextPrims._

/** Bounded-memory sketch operators — the primitives a 100 TB pipeline
  * reaches for when exact distinct/frequency state no longer fits:
  * HyperLogLog cardinality and Count-Min frequency. Both are built
  * DETERMINISTIC (integer register/cell state, double math only in fixed
  * left-to-right folds) so the DuckDB oracle verifies them value-exactly
  * — unlike engine-native `approx_count_distinct`, whose sketch layout is
  * implementation-defined and engine-specific.
  *
  * Scale shape is the whole point of a sketch: both aggregates are
  * partial-aggregable (`max` per HLL register, `sum` per CMS cell), so
  * every scan task reduces its split to a fixed-size table — 256
  * registers / depth×width cells — BEFORE the shuffle, and only that
  * fixed-size state ever crosses the wire, whatever the corpus size.
  */
object Sketches {

  /** HLL registers: 256 (8-bit index from the low hash bits); rank uses
    * the remaining 22 bits of the ~30-bit polynomial hash. */
  private val HllRegisters = 256
  private val HllRankBits = 22

  /** alpha_m · m² for m = 256 (Flajolet et al.'s bias constant),
    * computed once here and printed into the oracle SQL from this same
    * double, so the two engines share the literal bit-for-bit. */
  val HllAlphaM2: Double = 0.7213 / (1 + 1.079 / HllRegisters) * HllRegisters * HllRegisters

  /** HyperLogLog distinct-shingle estimate over a corpus, one output row:
    * `(m, n_present, n_exact, estimate, rel_error)`.
    *
    * The sketch path: shingle hash → (register = h mod 256, rank = number
    * of leading zero bits of the 22-bit remainder + 1) → `max(rank)` per
    * register (map-side partial: each task reduces to ≤256 rows before
    * the shuffle) → the harmonic estimate, computed as ONE fixed
    * left-to-right fold over the register-ordered ranks (missing
    * registers fold in as the seed term), so the double sum is
    * order-identical in DuckDB. The 256-element collect is bounded by
    * construction — registers, not rows.
    *
    * `n_exact` (and the error column it feeds) is the VERIFICATION
    * harness, not part of the sketch path: at 100 TB you run only the
    * register aggregate; the exact distinct count exists here so the
    * oracle pins both the sketch and its accuracy claim. */
  /** (register, rank) update rows from a (g) gram-hash frame. The rank
    * value must be uniform on a POWER-OF-TWO range or the geometric rank
    * distribution is systematically distorted (taking the high bits of
    * the mod-P hash directly — range ≈ 1.86·2^21, not 2^22 — biased the
    * estimate ~+8.6%): scramble g multiplicatively into the 998244353
    * range and keep the LOW 22 bits — the reduction modulus is tiny
    * relative to the range, so per-residue bias is ≤ 1/238 ≈ 0.4%. */
  private def registerUpdates(grams: DataFrame,
                              carry: Seq[String] = Nil): DataFrame = {
    val v = (col("g") * lit(48271L)) % lit(998244353L) % lit(1L << HllRankBits)
    // rank = leading zeros of the 22-bit value + 1 = 23 - bitlength(v);
    // bin() gives the minimal binary string on both engines.
    val rank = when(v === 0L, lit(HllRankBits + 1))
      .otherwise(lit(HllRankBits + 1) - length(bin(v))).cast("long")
    grams.select(carry.map(col) ++ Seq(
      (col("g") % HllRegisters).as("register"), rank.as("rank")): _*)
  }

  /** (register, rank) update rows for the HLL sketch — the shared shaping
    * of the batch estimate and the STREAMING register table: because the
    * register state is a monotone `max`, the same frame aggregates
    * incrementally under Structured Streaming with state bounded at 256
    * rows however long the stream runs (the sketch property that makes
    * HLL the streaming-cardinality primitive). Works on batch and
    * streaming DataFrames alike. */
  private[graft] def hllRegisterUpdates(df: DataFrame, idCol: String,
                                        textCol: String,
                                        shingleK: Int = 3): DataFrame =
    registerUpdates(TextDedup.shingleFrame(df, idCol, textCol, shingleK)
      .select(explode(col("sh")).as("g")))

  /** The 256-row register table: `max(rank)` per register — map-side
    * partial in batch, bounded incremental state in streaming. */
  def hllRegisters(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3): DataFrame =
    hllRegisterUpdates(df, idCol, textCol, shingleK)
      .groupBy("register").agg(max(col("rank")).as("m_j"))

  /** Shared HLL denominator over a folded `(arr, n_present)` row:
    * (m − present) · 2⁻⁰ + Σ 2^(−M_j), register-ascending — the seed
    * carries the absent registers, then one L-R fold. SQL form because
    * the Scala shiftleft only takes a literal shift; 2^(−M) by integer
    * shift + division is exact, matching the oracle bit-for-bit. One
    * definition (with [[HllRegisters]] interpolated, never a literal)
    * used by BOTH the global and grouped sketches so a register-count
    * change cannot skew one of them silently. */
  private def hllDenom: Column = expr(
    "aggregate(transform(arr, e -> CAST(1 AS DOUBLE) / " +
      "CAST(shiftleft(CAST(1 AS BIGINT), CAST(e.m_j AS INT)) AS DOUBLE)), " +
      s"CAST($HllRegisters AS DOUBLE) - CAST(n_present AS DOUBLE), " +
      "(acc, x) -> acc + x)")

  def hllShingleCardinality(df: DataFrame, idCol: String, textCol: String,
                            shingleK: Int = 3): DataFrame = {
    // ONE grams frame feeds both the register aggregate and the exact
    // count — the shared subtree reuses the shingle stage's exchange
    // instead of re-deriving the corpus per consumer
    val grams = TextDedup.shingleFrame(df, idCol, textCol, shingleK)
      .select(explode(col("sh")).as("g"))
    val regs = registerUpdates(grams)
      .groupBy("register").agg(max(col("rank")).as("m_j"))
    val exact = grams.agg(countDistinct(col("g")).as("n_exact"))
    val folded = regs.agg(
      sort_array(collect_list(struct(col("register"), col("m_j")))).as("arr"),
      count(lit(1)).as("n_present"))
    val denom = hllDenom
    folded.crossJoin(exact).select(
      lit(HllRegisters.toLong).as("m"),
      col("n_present"),
      col("n_exact"),
      (lit(HllAlphaM2) / denom).as("estimate"),
      ((lit(HllAlphaM2) / denom - col("n_exact").cast("double"))
        / col("n_exact").cast("double")).as("rel_error"))
  }

  /** Per-KEY HyperLogLog distinct-shingle estimates — the GROUPED form
    * of [[hllShingleCardinality]], the cube-able sketch pattern: one
    * register table PER GROUP (keys × 256 rows of mergeable `max`
    * state), so per-language / per-source cardinalities come from one
    * corpus pass, merge across partitions map-side like any partial
    * aggregate, and re-merge under coarser rollups without rescanning
    * (the reason warehouses store grouped HLL registers, not counts).
    * Same rank rule, same fold, same bias constant as the global sketch;
    * the per-key exact distinct stays the verification harness and the
    * collect-free path is the register aggregate alone. Output:
    * (key, m, n_present, n_exact, estimate, rel_error) by key. */
  def hllGroupedCardinality(df: DataFrame, idCol: String, textCol: String,
                            keyCol: String, shingleK: Int = 3): DataFrame = {
    val keys = df.select(col(idCol).as("id"), col(keyCol).as("key"))
    val grams = TextDedup.shingleFrame(df, idCol, textCol, shingleK)
      .join(keys, "id")
      .select(col("key"), explode(col("sh")).as("g"))
    val regs = registerUpdates(grams, carry = Seq("key"))
      .groupBy("key", "register").agg(max(col("rank")).as("m_j"))
    val exact = grams.groupBy("key").agg(countDistinct(col("g")).as("n_exact"))
    val folded = regs.groupBy("key").agg(
      sort_array(collect_list(struct(col("register"), col("m_j")))).as("arr"),
      count(lit(1)).as("n_present"))
    val denom = hllDenom
    folded.join(exact, "key").select(
      col("key"),
      lit(HllRegisters.toLong).as("m"),
      col("n_present"),
      col("n_exact"),
      (lit(HllAlphaM2) / denom).as("estimate"),
      ((lit(HllAlphaM2) / denom - col("n_exact").cast("double"))
        / col("n_exact").cast("double")).as("rel_error"))
      .orderBy("key")
  }

  /** Count-Min sketch hash-row parameters (seed, multiplier, modulus) —
    * four independent polynomial-hash families; printed into the oracle
    * SQL from these same constants. */
  val CmsParams: Seq[(Long, Long, Long)] = Seq(
    (7L, 31L, 1000000007L), (11L, 37L, 998244353L),
    (13L, 41L, 1000000007L), (17L, 43L, 998244353L))
  private val CmsWidth = 1024

  /** Count-Min frequency estimates for the corpus's top-`k` tokens, one
    * row per probed token: `(token, tf_exact, tf_cms, overestimate)` —
    * all integers, so the oracle compare is exact; `tf_cms ≥ tf_exact`
    * always (collisions only ever add).
    *
    * Sketch path: every token occurrence maps to `depth` (row, cell)
    * pairs (cell = row's polynomial hash mod 1024 — a row-local
    * expression); `sum` per cell is map-side partial, so each scan task
    * crosses the shuffle with ≤ depth×width cell counters regardless of
    * corpus size. The probe side recomputes each probe token's cells and
    * takes the min across rows. `tf_exact` / the top-k probe list is the
    * verification harness: at 100 TB the sketch table is the product and
    * probes are point lookups. */
  private def cellOf(row: Int, c: Column): Column = {
    val (seed, mult, mod) = CmsParams(row)
    PolyHash(c, seed, mult, mod) % CmsWidth
  }

  /** The depth×width CMS cell table: occurrence counts per (row, cell) —
    * map-side partial in batch; under Structured Streaming the same frame
    * aggregates incrementally with state bounded at depth×width rows
    * (counts are mergeable sums), the streaming twin SketchesSpec pins
    * against the batch table. */
  def cmsCells(df: DataFrame, textCol: String): DataFrame = {
    val toks = df.select(explode(tokens(col(textCol))).as("token"))
    toks.select(explode(array(CmsParams.indices.map(j =>
        struct(lit(j).as("row"), cellOf(j, col("token")).as("cell"))): _*)).as("rc"))
      .select(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .groupBy("row", "cell").agg(count(lit(1)).as("c"))
  }

  /** KMV bottom-k sample size for the quantile sketch: 256 ids, the same
    * fixed-state budget as the HLL register table. */
  val KmvK = 256

  /** Hash-priority of a row id for the KMV sample — the p63 scramble
    * (id · 2654435761 mod P): deterministic, uniform, trivially
    * replayable in SQL. */
  private val KmvP = 1000000007L
  private def kmvPriority(id: Column): Column =
    (id * lit(2654435761L)) % lit(KmvP)

  /** The quantile sketch STATE: the `k` corpus rows with the smallest
    * hash priority, as (id, v) where v is the document's token count —
    * a KMV/bottom-k sample (Cohen & Kaplan's bottom-k sketch family).
    * MERGEABLE: bottom-k of a union is the bottom-k of the two bottom-k
    * states (the heap order is total), which SketchesSpec pins by
    * split-merge parity; partial-aggregable via the same k-bounded
    * [[graft.functions.TopKAgg]] heap the ANN rankers use, so each scan
    * task crosses the shuffle with ≤ k entries whatever the corpus size.
    * Priorities stay below 2^30 so the negated double heap key is exact. */
  def kmvState(df: DataFrame, idCol: String, textCol: String,
               k: Int = KmvK): DataFrame = {
    val vals = df.select(col(idCol).cast("long").as("id"),
      size(tokens(col(textCol))).cast("long").as("v"))
    val sampled = vals
      .select(col("id"), (-kmvPriority(col("id"))).cast("double").as("negPr"))
      .agg(graft.functions.TopKAgg.topk(col("negPr"), col("id"), k).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.neighbor_id").as("id"))
    sampled.join(vals, "id")
  }

  /** Merge KMV states (the sketch-union operation): bottom-k of the
    * union of bottom-k states equals the bottom-k of the union of the
    * raw inputs — the mergeability SketchesSpec pins by split-merge
    * parity. Priorities re-derive from the ids (a pure function), so a
    * state is just its (id, v) rows and merging is re-selection.
    *
    * States may OVERLAP (sketches over corpora sharing rows — the normal
    * union case): the id-dedup below keeps the heap honest, since the
    * same id entering twice would displace a distinct id and fan the
    * final value join out to duplicate rows. Dedup by id alone is exact
    * because a state row's priority and value are both pure functions of
    * the id. */
  def kmvMerge(k: Int, states: Seq[DataFrame]): DataFrame = {
    val u = states.reduce(_ unionByName _).dropDuplicates("id")
    val sampled = u
      .select(col("id"), (-kmvPriority(col("id"))).cast("double").as("negPr"))
      .agg(graft.functions.TopKAgg.topk(col("negPr"), col("id"), k).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.neighbor_id").as("id"))
    sampled.join(u, "id")
  }

  /** Quantile estimates from the KMV sample beside their exact
    * verification twins, one row per probe:
    * `(q, sample_k, n_rows, est_value, exact_value, abs_error)`.
    *
    * The estimate is the lower discrete quantile OF THE SAMPLE (the value
    * at ascending sample rank max(1, ceil(q·k)) — a uniform-sample order
    * statistic, error O(1/√k)); `exact_value` is the same rank rule over
    * the full corpus and exists as the verification harness (the HLL
    * `n_exact` convention — at 100 TB you run only the sketch side). All
    * outputs are integers plus one exact subtraction, so the DuckDB twin
    * compares value-for-value.
    *
    * Scale shape: the sketch side folds ≤ k sampled values into one row
    * (bounded like the HLL 256-register collect); the exact side uses the
    * [[graft.ops.Percentiles]] bucketed rank-select plan — a bounded
    * histogram collect (numRanges rows) locates each probe's bin, and
    * row_number runs only inside target bins keyed by probe, never a
    * global sort window. */
  def kmvQuantiles(df: DataFrame, idCol: String, textCol: String,
                   probes: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
                   k: Int = KmvK): DataFrame = {
    require(probes.nonEmpty && probes.forall(q => q > 0 && q <= 1),
      "probes must be in (0, 1]")
    val vals = df.select(col(idCol).cast("long").as("id"),
      size(tokens(col(textCol))).cast("long").as("v"))
    val est = kmvState(df, idCol, textCol, k)
      .agg(sort_array(collect_list(col("v"))).as("vs"),
        count(lit(1)).as("sample_k"))
      .select(explode(array(probes.map(lit): _*)).as("q"),
        col("vs"), col("sample_k"))
      .select(col("q"), col("sample_k"),
        element_at(col("vs"),
          greatest(lit(1L), ceil(col("q") * col("sample_k"))).cast("int"))
          .as("est_value"))
    val exact = exactRankSelectFlat(vals, "v", probes)
    est.join(exact, "q")
      .select(col("q"), col("sample_k"), col("n_rows"),
        col("est_value"), col("exact_value"),
        (col("est_value") - col("exact_value")).as("abs_error"))
      .orderBy("q")
  }

  /** Keyless exact rank-select — [[graft.ops.Percentiles.exactRankSelect]]
    * with the per-key machinery dropped (a constant key would fold into an
    * unpartitioned window): one 1-row bounds aggregate, row-local monotone
    * binning, a bounded-histogram collect locating each probe's target
    * bin + residual rank on the driver, then row_number ONLY inside
    * target bins partitioned BY PROBE — bounded sorts, probe-way
    * parallelism, never a global sort. */
  private def exactRankSelectFlat(vals: DataFrame, value: String,
                                  probes: Seq[Double]): DataFrame = {
    val spark = vals.sparkSession
    val bounds = vals
      .agg(min(value).cast("double"), max(value).cast("double"), count(lit(1)))
      .collect().head
    // read count FIRST: on an empty frame min/max are NULL and the
    // getDouble calls would throw an opaque NPE
    val nRows = bounds.getLong(2)
    require(nRows > 0, "kmvQuantiles requires a non-empty corpus")
    val (loD, hiD) = (bounds.getDouble(0), bounds.getDouble(1))
    val nBuckets = graft.ops.Adaptive.numRanges(nRows, floor = 64)
    val binned = vals.withColumn("__bin", least(lit(nBuckets - 1),
      floor((col(value).cast("double") - loD) * nBuckets / (hiD - loD + 1.0)))
      .cast("int"))
    // bounded: ≤ nBuckets rows, the Percentiles histogram-collect shape
    val hist = binned.groupBy("__bin").agg(count(lit(1)).as("__c"))
      .orderBy("__bin").collect().map(r => r.getInt(0) -> r.getLong(1))
    val cum = hist.scanLeft((0, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }.drop(1)
    val targets = probes.map { q =>
      val r = math.max(1L, math.ceil(q * nRows).toLong)
      val (bin, cumAt) = cum.find(_._2 >= r).get
      val below = cum.takeWhile(_._1 < bin).lastOption.map(_._2).getOrElse(0L)
      (q, bin, r - below)
    }
    import spark.implicits._
    val tdf = targets.toDF("q", "__bin", "__rk")
    val wBin = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(value)
    binned.join(broadcast(tdf), Seq("__bin"))
      .withColumn("__rn", row_number().over(wBin))
      .filter(col("__rn") === col("__rk"))
      .select(col("q"), col(value).as("exact_value"), lit(nRows).as("n_rows"))
  }

  def cmsTokenFrequency(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 10): DataFrame = {
    // ONE token-count aggregate feeds both the cell table (cell counts =
    // sums of per-token counts) and the exact top-k probe list — the two
    // branches share the token exchange instead of tokenizing the corpus
    // twice. (The streaming path uses the single-aggregate [[cmsCells]]
    // form instead: chained streaming aggregations are unsupported.)
    val tokenCounts = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val cells = tokenCounts.select(col("cnt"),
        explode(array(CmsParams.indices.map(j =>
          struct(lit(j).as("row"), cellOf(j, col("token")).as("cell"))): _*)).as("rc"))
      .select(col("rc.row").as("row"), col("rc.cell").as("cell"), col("cnt"))
      .groupBy("row", "cell").agg(sum(col("cnt")).as("c"))
    val top = tokenCounts.withColumnRenamed("cnt", "tf_exact")
      .orderBy(desc("tf_exact"), col("token")).limit(k)
    val probes = top.select(col("token"), col("tf_exact"),
        explode(array(CmsParams.indices.map(j =>
          struct(lit(j).as("row"), cellOf(j, col("token")).as("cell"))): _*)).as("rc"))
      .select(col("token"), col("tf_exact"),
        col("rc.row").as("row"), col("rc.cell").as("cell"))
    probes.join(cells, Seq("row", "cell"))
      .groupBy("token", "tf_exact").agg(min(col("c")).as("tf_cms"))
      .select(col("token"), col("tf_exact"), col("tf_cms"),
        (col("tf_cms") - col("tf_exact")).as("overestimate"))
      .orderBy(desc("tf_exact"), col("token"))
  }
}
