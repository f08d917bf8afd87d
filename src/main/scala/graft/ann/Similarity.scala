package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.AnnPrims._

/** Embedding similarity search over an `Array[Float]` column: brute-force
  * cosine top-k as the exact baseline, random-hyperplane LSH bucketing as
  * the scale path, and blocked near-duplicate pair mining.
  *
  * Scale design:
  *  - the query set is broadcast, the corpus is streamed — one pass, no
  *    corpus shuffle for the similarity compute;
  *  - top-k is a two-phase tournament (per-partition top-k, then merge),
  *    never a global sort: each scan task reduces its split to k rows per
  *    query before anything shuffles;
  *  - LSH buckets turn all-pairs O(n²) into a join keyed on (table,
  *    bucket) — only same-bucket vectors are ever compared.
  */
object Similarity {

  /** Deterministic bounded top-k: candidates (query_id, neighbor_id, sim)
    * → k best per query under (sim desc, neighbor_id asc), via the
    * [[graft.functions.TopKAgg]] k-bounded heap aggregate. Spark plans it
    * partial→final, so each scan task reduces its split to ≤ k entries per
    * query BEFORE the shuffle with O(k) memory per (query, partition) —
    * never a global sort, never a per-partition candidate array (the
    * collect_list form this replaced was O(partition rows) per group). The
    * result is independent of partitioning because merging bounded heaps
    * under a total order is associative. */
  private[ann] def topK(cands: DataFrame, k: Int): DataFrame =
    cands
      .groupBy("query_id")
      .agg(graft.functions.TopKAgg.topk(
        col("sim"), col("neighbor_id").cast("long"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("knn_rank"),
        col("col.neighbor_id").as("neighbor_id"),
        col("col.sim").as("sim"))
      .orderBy("query_id", "knn_rank")

  /** Exact cosine top-k: every query against the full corpus. */
  def knnBruteForce(emb: DataFrame, idCol: String, vecCol: String,
                    queryPred: Column, k: Int = 5): DataFrame = {
    val v = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("ne"))
    val q = emb.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qe"))
    val cands = v.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ne")).as("sim"))
    topK(cands, k)
  }

  /** MMR diversity re-rank (Carbonell & Goldstein 1998 — maximal
    * marginal relevance, the standard retrieval-diversity pass every
    * RAG stack runs after ANN): from each query's exact top-`kCand`
    * candidates, greedily select `m` results maximizing
    * `λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)` — relevance traded
    * against redundancy with what is already picked. Step 1's penalty
    * term is empty by convention (score = λ·sim, same argmax as plain
    * relevance); ties break toward the smaller neighbor id at every
    * step (a total order, so both engines pick identically).
    *
    * The selection loop is UNROLLED into m declarative stages (m is a
    * small constant by charter, like nProbe): each stage anti-joins the
    * picked set off the candidates, computes the max-similarity penalty
    * against the picked vectors, and takes the per-query argmax via
    * `max(struct(...))` — no window over the corpus, no driver loop.
    * Scale shape: every stage's frames are bounded by |queries|·kCand
    * (the broadcast-probe charter all ANN queries share); the corpus is
    * touched only by the candidate generation, which is the existing
    * verified search. All doubles are single products/subtractions of
    * bit-equal cosines, so the oracle replays the greedy exactly.
    * Output: (query_id, mmr_rank, neighbor_id, sim, mmr_score). */
  /** The p160/p161 MMR configuration, shared with the DuckDB twins
    * (the oracle builders read these same values), so tuning one side
    * cannot silently diverge the other. */
  val MmrKCand = 8
  val MmrM = 3
  val MmrLambda = 0.7

  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, kCand: Int = MmrKCand, m: Int = MmrM,
                lambda: Double = MmrLambda): DataFrame = {
    require(m >= 1 && m <= kCand, s"mmrRerank: need 1 <= m <= kCand")
    mmrOverSearch(knnBruteForce(emb, idCol, vecCol, queryPred, kCand),
      emb, idCol, vecCol, m, lambda)
  }

  /** [[mmrGreedy]] over any search result shaped (query_id, neighbor_id,
    * sim, …): attaches candidate vectors by neighbor id — the one piece
    * of glue between a search and the greedy, kept in one place so the
    * p160 (brute-force) and p161 (IVFADC+R) configs cannot drift on the
    * candidate-frame contract. */
  def mmrOverSearch(search: DataFrame, emb: DataFrame, idCol: String,
                    vecCol: String, m: Int = MmrM,
                    lambda: Double = MmrLambda): DataFrame =
    mmrGreedy(
      search.select(col("query_id").cast("long").as("query_id"),
          col("neighbor_id"), col("sim"))
        .join(emb.select(col(idCol).cast("long").as("neighbor_id"),
          col(vecCol).as("ne")), "neighbor_id"),
      m, lambda)

  /** The greedy MMR selection over an arbitrary candidate frame
    * (query_id, neighbor_id, sim, ne) — [[mmrRerank]]'s engine, shared
    * with the deployment config that feeds it the IVFADC+R re-ranked
    * shortlist (p161) so the two cannot drift. A query whose candidate
    * pool holds fewer than `m` rows returns fewer ranks (later stages
    * have nothing left to pick — the same truncation a small pool causes
    * in [[mmrRerank]]); callers needing exactly m rows per query must
    * size the upstream search accordingly. */
  def mmrGreedy(candFrame: DataFrame, m: Int, lambda: Double): DataFrame = {
    require(m >= 1, s"mmrGreedy: m must be >= 1")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"mmrGreedy: lambda must be in [0, 1], got $lambda")
    // localCheckpoint: every greedy stage references the candidate frame;
    // truncating the upstream search lineage keeps the unrolled plan
    // O(m) and scans the corpus ONCE (the duplicateGroups round
    // convention) instead of embedding the search subtree per stage.
    val cands = candFrame.localCheckpoint()
    def pick(scored: DataFrame, rank: Int): DataFrame =
      scored.groupBy("query_id")
        .agg(max(struct(col("score"), (-col("neighbor_id")).as("nid"),
          col("neighbor_id").as("id"), col("sim").as("s"))).as("m"))
        .select(col("query_id"), lit(rank.toLong).as("mmr_rank"),
          col("m.id").as("neighbor_id"), col("m.s").as("sim"),
          col("m.score").as("mmr_score"))
    var picked = pick(cands.withColumn("score", lit(lambda) * col("sim")), 1)
    var out = picked
    // `rem` carries the RUNNING penalty — max cosine to anything picked
    // so far. max is exact and order-free, so the stepwise greatest()
    // fold is bit-identical to the max-over-all-picks the oracle
    // computes; −∞ seeds it so a single pick's (possibly negative)
    // cosine passes through unchanged. Each stage references rem and the
    // latest pick ONCE and re-checkpoints, so the plan stays flat in m.
    var rem = cands.withColumn("pen", lit(Double.NegativeInfinity))
    for (j <- 2 to m) {
      // the pick's vector comes from the candidate frame itself (a pick
      // is always one of its query's candidates)
      val pk = picked.select(col("query_id"), col("neighbor_id"))
        .join(cands.select(col("query_id"), col("neighbor_id"), col("ne")),
          Seq("query_id", "neighbor_id"))
        .select(col("query_id"), col("neighbor_id").as("__pid"),
          col("ne").as("__pe"))
      rem = rem.join(pk, Seq("query_id"))
        .filter(col("neighbor_id") =!= col("__pid"))
        .withColumn("pen", greatest(col("pen"), cosine(col("ne"), col("__pe"))))
        .drop("__pid", "__pe")
        .localCheckpoint()
      picked = pick(rem.withColumn("score",
        lit(lambda) * col("sim") - lit(1.0 - lambda) * col("pen")), j)
      out = out.unionByName(picked)
    }
    out.orderBy("query_id", "mmr_rank")
  }

  /** Approximate cosine top-k: compare only vectors in the same
    * random-hyperplane sign bucket (2^nPlanes buckets). Queries whose
    * bucket holds fewer than k neighbors return fewer rows — the standard
    * IVF/LSH recall trade. `nPlanes` is RESULT-affecting (a different
    * bucketing returns different approximate neighbors), so — per the
    * Adaptive doctrine shared with [[knnIvf]] and [[nearDupPairs]] — the
    * occupancy-targeting derivation is OPT-IN: pass
    * [[graft.ops.Adaptive.Auto]] to derive the plane count from the
    * corpus size ([[graft.ops.Adaptive.lshPlanes]], bucket occupancy
    * ~64 instead of linear growth under a fixed count); the default stays
    * the fixed 8 so existing callers keep their neighbors at any scale.
    * NOTE: the Auto path is EAGER — it runs one columnar `count()` over
    * the corpus at call time, before the operator plan is built, and
    * repeated calls pay it repeatedly. Pipelines composing knnLsh lazily
    * should pass an explicit `nPlanes`. */
  def knnLsh(emb: DataFrame, idCol: String, vecCol: String,
             queryPred: Column, k: Int = 5,
             nPlanes: Int = 8,
             dim: Int = 64): DataFrame = {
    val planes = resolvePlanes(emb, nPlanes)
    val bucketed = emb.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("ne"),
      signBucket(col(vecCol), 0, planes, dim).as("bucket"))
    val q = emb.filter(queryPred).select(
      col(idCol).as("query_id"), col(vecCol).as("qe"),
      signBucket(col(vecCol), 0, planes, dim).as("bucket"))
    val cands = bucketed.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ne")).as("sim"))
    topK(cands, k)
  }

  /** IVF-flat approximate top-k: a small coarse-quantizer table of
    * `nCells` centroids partitions the corpus into cells; each query
    * probes only its `nProbe` nearest cells. Centroids here are the
    * `nCells` lowest-id vectors — deterministic so the DuckDB oracle can
    * mirror the choice; a k-means-trained quantizer would slot in
    * unchanged (the plan depends only on the centroid table being small).
    *
    * Scale shape — the reason IVF beats sign-bucket LSH at high recall:
    * the quantizer is collected once (nCells × dim floats, a few KB) and
    * carried as one reference object by the fused assignment expression, so cell assignment is a narrow per-row argmax —
    * the corpus NEVER shuffles: not for assignment (row-local
    * expression), not for search (probes broadcast onto the assigned
    * corpus), not for ranking (the per-partition top-k tournament). Probe
    * lists scale recall at cost nProbe/nCells of the corpus per query.
    *
    * `nCells` is RESULT-affecting (a different quantizer returns
    * different approximate neighbors), so the adaptive sizing is opt-in,
    * not the default: pass [[graft.ops.Adaptive.Auto]] to derive
    * `nlist ≈ sqrt(n)` from the corpus count
    * ([[graft.ops.Adaptive.ivfCells]]); oracle-pinned queries keep their
    * explicit values. */
  def knnIvf(emb: DataFrame, idCol: String, vecCol: String,
             queryPred: Column, k: Int = 5, nCells: Int = 8,
             nProbe: Int = 2): DataFrame =
    knnIvfWith(emb, idCol, vecCol, queryPred,
      lowestIdCentroids(emb, idCol, vecCol, resolveCells(emb, nCells)), k, nProbe)

  /** `nCells` verbatim, or the sqrt-rule size when the caller opted into
    * [[graft.ops.Adaptive.Auto]] (one columnar count against the corpus,
    * only on the opt-in path). */
  private def resolveCells(emb: DataFrame, nCells: Int): Int = {
    require(nCells >= 0, "nCells must be >= 1, or Adaptive.Auto (0)")
    if (nCells == graft.ops.Adaptive.Auto) graft.ops.Adaptive.ivfCells(emb.count())
    else nCells
  }

  /** `nPlanes` verbatim, or the bucket-occupancy derivation when the
    * caller opted into [[graft.ops.Adaptive.Auto]] — the opt-in path is
    * EAGER: one columnar count against the corpus at call time. */
  private def resolvePlanes(emb: DataFrame, nPlanes: Int): Int = {
    require(nPlanes >= 0, "nPlanes must be >= 1, or Adaptive.Auto (0)")
    if (nPlanes == graft.ops.Adaptive.Auto) graft.ops.Adaptive.lshPlanes(emb.count())
    else nPlanes
  }

  /** Multi-table sign-LSH top-k — the OR-construction that recovers
    * recall over [[knnLsh]]'s single table: a neighbor is a candidate
    * when it shares a bucket with the query in AT LEAST ONE of `tables`
    * independent plane sets (table t uses planes
    * [t·planesPerTable, (t+1)·planesPerTable), so table 0 is exactly the
    * single-table operator's view), and single-table false negatives
    * fade as miss^tables for tables× banding work plus one candidate
    * dedup.
    *
    * Scale shape: the banded frame carries (id, tbl, bucket) only; the
    * query side broadcasts, so the bucket match is a BroadcastHashJoin
    * probed in the corpus's own scan partitioning — a hot bucket streams
    * through many tasks instead of shuffling into one (which is why this
    * needs no maxBucket cap: per-bucket cost is members × queries-in-
    * bucket, never members²). Vectors rejoin only for the deduped
    * candidates; ranking is the k-bounded heap, never a sort.
    *
    * Both shape knobs are RESULT-affecting, so their derivations are
    * opt-in per the Adaptive doctrine: pass [[graft.ops.Adaptive.Auto]]
    * as `planesPerTable` to target ~[[graft.ops.Adaptive.LshBucketRows]]
    * members per bucket (one EAGER corpus count at call time), and/or as
    * `tables` to pair the table count to the resolved plane count
    * ([[graft.ops.Adaptive.lshMultiTables]] — more tables as buckets get
    * finer, holding recall). The floors reproduce the historical
    * (8 planes, 4 tables), so oracle-pinned p92 rows are unchanged at
    * test scale when opting in. */
  def knnLshMulti(emb: DataFrame, idCol: String, vecCol: String,
                  queryPred: Column, k: Int = 5, tables: Int = 4,
                  planesPerTable: Int = 8, dim: Int = 64): DataFrame = {
    require(tables >= 0, "tables must be >= 1, or Adaptive.Auto (0)")
    val ppt = resolvePlanes(emb, planesPerTable)
    val nTables =
      if (tables == graft.ops.Adaptive.Auto) graft.ops.Adaptive.lshMultiTables(ppt)
      else tables
    val v = emb.select(col(idCol).as("id"), col(vecCol).as("e"))
    val banded = emb.select(col(idCol).as("id"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("tbl"),
          signBucket(col(vecCol), t * ppt, ppt, dim).as("bucket"))): _*))
        .as("bb"))
      .select(col("id"), col("bb.tbl").as("tbl"), col("bb.bucket").as("bucket"))
    val qb = banded.join(emb.filter(queryPred).select(col(idCol).as("id")), Seq("id"))
      .select(col("id").as("query_id"), col("tbl"), col("bucket"))
    val pairs = banded.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"))
      .distinct()
    val cands = pairs
      .join(v.select(col("id").as("query_id"), col("e").as("qe")), Seq("query_id"))
      .join(v.select(col("id").as("neighbor_id"), col("e").as("ne")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ne")).as("sim"))
    topK(cands, k)
  }

  /** The `nCells` lowest-id vectors as a coarse quantizer — deterministic
    * so the DuckDB oracle can mirror the choice. */
  def lowestIdCentroids(emb: DataFrame, idCol: String, vecCol: String,
                        nCells: Int): Array[(Long, Array[Float])] =
    emb.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)).limit(nCells)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** (cos, -cent_id) structs: lexicographic struct order makes array_max
    * pick highest cosine with ties broken toward the smallest centroid id
    * — exactly the oracle's ORDER BY cos DESC, cent_id ASC. This literal
    * form builds one expression node PER CENTROID, so it is kept only as
    * the executable SPEC of the fused assignment (pinned bit-equal in
    * CellAssignSpec): the hot paths run [[graft.functions.CellArgmax]] /
    * [[graft.functions.CellProbes]], whose centroid table rides codegen
    * as one reference object and therefore scales in CELL count (a 10⁵-
    * cell quantizer is a plan-size catastrophe as literals, a flat array
    * scan as data — round-12's one flagged weakness). */
  private[ann] def scoredCellsOf(vec: Column, cents: Array[(Long, Array[Float])]): Column =
    array(cents.map { case (cid, cv) =>
      struct(cosine(vec, typedLit(cv)).as("cs"), lit(-cid).as("nc"))
    }: _*)

  /** Declarative argmax assignment — the spec twin of the fused path. */
  def cellOfSpec(vec: Column, cents: Array[(Long, Array[Float])]): Column =
    -array_max(scoredCellsOf(vec, cents)).getField("nc")

  /** Declarative probe list — the spec twin of the fused path. */
  def probeCellsSpec(vec: Column, cents: Array[(Long, Array[Float])],
                     nProbe: Int): Column =
    transform(
      slice(reverse(array_sort(scoredCellsOf(vec, cents))), 1, nProbe),
      pc => -pc.getField("nc"))

  /** Fused argmax cell assignment (see [[scoredCellsOf]]). Shared with
    * [[ProductQuantizer.knnIvfPq]] so the IVF-PQ coarse layer cannot
    * drift from the IVF-flat one. */
  private[ann] def cellOfCents(vec: Column, cents: Array[(Long, Array[Float])]): Column =
    graft.functions.CellArgmax(vec, cents)

  /** Fused (cos DESC, cent_id ASC) probe list (see [[scoredCellsOf]]). */
  private[graft] def probeCellsOf(vec: Column, cents: Array[(Long, Array[Float])],
                                nProbe: Int): Column =
    graft.functions.CellProbes(vec, cents, nProbe)

  private def cellOf(vec: Column, cents: Array[(Long, Array[Float])]): Column =
    cellOfCents(vec, cents)

  /** IVF search against an explicit quantizer table — the plan shape of
    * [[knnIvf]] with the centroid choice factored out, so a trained
    * quantizer ([[trainIvfCentroids]]) slots in without touching the
    * search: the centroid table rides the fused assignment expression as
    * one reference object, cell assignment stays a narrow row-local
    * argmax, and the corpus still never shuffles. Centroid ids are only
    * a deterministic tiebreak token. */
  def knnIvfWith(emb: DataFrame, idCol: String, vecCol: String,
                 queryPred: Column, cents: Array[(Long, Array[Float])],
                 k: Int = 5, nProbe: Int = 2): DataFrame = {
    val assigned = emb.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("ne"),
      cellOf(col(vecCol), cents).as("cell"))
    val probes = emb.filter(queryPred).select(
        col(idCol).as("query_id"), col(vecCol).as("qe"),
        explode(probeCellsOf(col(vecCol), cents, nProbe)).as("cell"))
    val cands = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ne")).as("sim"))
    topK(cands, k)
  }

  /** Corpus clustering profile under the deterministic lowest-id
    * quantizer: one row per cell with its population, id range and corpus
    * share — the "how balanced is my index" diagnostic every IVF
    * deployment watches (an unbalanced quantizer turns nProbe into a
    * full scan of the hot cell). Scale shape: assignment is the same
    * row-local argmax the search uses (the fused reference-object expression —
    * no corpus shuffle), the profile is one partial-agg groupBy on an
    * `nCells`-ary key, and the share window runs over nCells rows. */
  def cellProfile(emb: DataFrame, idCol: String, vecCol: String,
                  nCells: Int = 8): DataFrame = {
    val cents = lowestIdCentroids(emb, idCol, vecCol, nCells)
    val assigned = emb.select(col(idCol).cast("long").as("vid"),
      cellOf(col(vecCol), cents).as("cell"))
    // the share denominator is the corpus size — every vector is assigned
    // to exactly ONE cell (the partition invariant the spec asserts), so
    // one metadata-cheap count replaces the global window this used to
    // run (whose empty partition spec tripped WindowExec's no-partition
    // warning in every Verify/driver log; a constant partition key gets
    // folded away by the optimizer, so the window had to go entirely)
    val total = emb.count()
    assigned.groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vid")).as("min_vec_id"), max(col("vid")).as("max_vec_id"))
      .withColumn("share", col("n_vectors").cast("double") /
        lit(total).cast("double"))
      .orderBy("cell")
  }

  /** Bounded-Lloyd k-means training for the IVF quantizer, deterministic
    * end-to-end: init = the `nCells` lowest-id vectors, then `iters`
    * rounds of (assign by max-cosine, recompute per-cell means). Each
    * round is ONE distributed pass: assignment is the same row-local
    * argmax the search uses (the fused reference-object expression — the corpus
    * never shuffles for it) and the mean reduction is a per-dimension
    * `sum` aggregate, so only (nCells × dim) partial sums ride the
    * shuffle — never vectors. The driver holds nCells × dim floats per
    * round (a few KB); empty cells keep their previous centroid. Ids are
    * carried from the seed vectors purely as stable tiebreak tokens. */
  def trainIvfCentroids(emb: DataFrame, idCol: String, vecCol: String,
                        nCells: Int = 8, iters: Int = 3): Array[(Long, Array[Float])] = {
    var cents = lowestIdCentroids(emb, idCol, vecCol, resolveCells(emb, nCells))
    val dim = cents.headOption.map(_._2.length).getOrElse(0)
    for (_ <- 0 until iters) {
      val aggs = count(lit(1)).as("n") +:
        (0 until dim).map(i => sum(element_at(col("__v"), i + 1).cast("double")).as(s"s$i"))
      val byCell = emb
        .select(col(vecCol).as("__v"), cellOf(col(vecCol), cents).as("cell"))
        .groupBy("cell").agg(aggs.head, aggs.tail: _*)
        .collect().map(r => r.getLong(0) -> r).toMap
      cents = cents.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(r) =>
            val n = r.getLong(1).toDouble
            (cid, Array.tabulate(dim)(i => (r.getDouble(2 + i) / n).toFloat))
          case None => (cid, old)
        }
      }
    }
    cents
  }

  /** Two-level coarse-quantizer structure over an already-trained cell
    * table: `nSuper` superclusters (default ⌈√nCells⌉) trained by
    * DRIVER-SIDE spherical k-means over the CENTROID TABLE — bounded by
    * construction: the centroid table is the small frame (≤ ~10⁵ rows ×
    * dim floats), so no Spark jobs are spent on it. Deterministic
    * end-to-end: init = every ⌊n/nSuper⌋-th centroid (ids 0..nSuper−1),
    * assignment by (cos DESC, sid ASC), means accumulated in index
    * order, empty superclusters keep their previous vector. Returns
    * (supers, cells-with-super) in the [[graft.functions.CellArgmaxNested]]
    * layout; both tables persist for the oracle replay (p125). */
  def trainTwoLevel(cents: Array[(Long, Array[Float])], nSuper: Int = 0,
                    iters: Int = 3)
      : (Array[(Long, Array[Float])], Array[(Long, Long, Array[Float])]) = {
    require(cents.nonEmpty, "two-level quantizer needs a non-empty cell table")
    val n = cents.length
    val k = if (nSuper > 0) math.min(nSuper, n)
            else math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    val dim = cents.head._2.length
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    var sup: Array[Array[Float]] =
      Array.tabulate(k)(s => cents((s.toLong * n / k).toInt)._2.clone())
    var assign = new Array[Int](n)
    def assignAll(): Unit = {
      var c = 0
      while (c < n) {
        var bestS = 0
        var bestCs = Double.NegativeInfinity
        var s = 0
        while (s < k) {
          val cs = cosine(cents(c)._2, sup(s))
          val cmp = java.lang.Double.compare(cs, bestCs)
          if (cmp > 0) { bestCs = cs; bestS = s } // ties keep smaller sid
          s += 1
        }
        assign(c) = bestS
        c += 1
      }
    }
    for (_ <- 0 until iters) {
      assignAll()
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var c = 0
      while (c < n) {
        val s = assign(c)
        val v = cents(c)._2
        var i = 0
        while (i < dim) { sums(s)(i) += v(i).toDouble; i += 1 }
        counts(s) += 1
        c += 1
      }
      sup = Array.tabulate(k)(s =>
        if (counts(s) == 0) sup(s)
        else Array.tabulate(dim)(i => (sums(s)(i) / counts(s)).toFloat))
    }
    assignAll() // final mapping against the final supercluster vectors
    val supers = Array.tabulate(k)(s => (s.toLong, sup(s)))
    val cellsWithSuper = Array.tabulate(n)(c =>
      (cents(c)._1, assign(c).toLong, cents(c)._2))
    (supers, cellsWithSuper)
  }

  /** Two-level cell assignment column — [[graft.functions.CellArgmaxNested]]
    * over a [[trainTwoLevel]] structure. */
  def cellOfTwoLevel(vec: Column, supers: Array[(Long, Array[Float])],
                     cells: Array[(Long, Long, Array[Float])],
                     wSuper: Int = 2): Column =
    graft.functions.CellArgmaxNested(vec, supers, cells, wSuper)

  /** Near-duplicate vector pairs with cosine ≥ `minSim`, blocked by
    * multi-table LSH (pairs must share a sign bucket in at least one of
    * `tables` independent plane sets — the OR-construction that recovers
    * recall at moderate similarity). Output: (vec_a, vec_b, sim).
    *
    * Scale shape (round 15): the vector RIDES the banded frame and the
    * codegen'd cosine evaluates AT PROBE TIME, inside the (tbl, bucket)
    * self-join, with the `sim >= minSim` filter immediately after — so a
    * bucket's m² candidate pairs are generated, scored, and discarded
    * in-stream, and only true near-duplicates ever reach an exchange
    * (the [[graft.text.TextDedup.simhashNearDup]] hamming-at-probe
    * pattern). The superseded design shuffled (id, tbl, bucket) only and
    * re-joined vectors after a global candidate `distinct()` — narrower
    * banding exchange (ids vs ×`tables` vectors, ~8× at dim 64), but the
    * distinct materializes Σ m² candidate rows: measured at 1M vectors /
    * 14 planes that is ~10⁹ rows and an 80 GB spill-to-death, vs the
    * vector-carrying exchange's ~2 GB. Probe-time scoring costs ≤`tables`
    * cosines per surviving pair (deduped after, result-identical since
    * cosine is deterministic per pair). The two join sides reuse one
    * exchange. Nothing is persisted. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   minSim: Double = 0.4, tables: Int = 4,
                   planesPerTable: Int = graft.ops.Adaptive.Auto, dim: Int = 64,
                   maxBucket: Int = graft.text.TextDedup.DefaultMaxBucket)
      : DataFrame = {
    // The plane count DEFAULTS to the occupancy derivation
    // (Adaptive.lshPlanes at the MINER target, Adaptive.MinerBucketRows
    // = 16 expected rows/bucket — not the kNN search target 64: an
    // all-pairs pass pays Σ m² per bucket, and the 64-row target
    // measured ~1B candidates at 1M vectors). This is a deliberate
    // exception to the Adaptive doctrine's "result-affecting knobs are
    // opt-in" rule, adjudicated round 16: a FIXED default plane count is
    // a silent-empty trap at scale — with 4 planes (16 buckets/table)
    // every bucket exceeds any sane hot-bucket cap at ≥1M vectors, so
    // 100% of banded rows were cap-stranded and the miner returned an
    // EMPTY frame with no diagnostic. A default must degrade loudly or
    // adapt; this one adapts, and the oracle twins replay the derivation
    // in SQL (`least(20, greatest(4, length(bin(n−1)) − 4))`, the
    // integer-exact ⌈log2(n/16)⌉ — p23/p59/p122/p127/p164 gate it at
    // both scales, where the derived counts are 5/7/9, ≠ the old 4).
    // Fixed plane counts remain available for pinned-quantization
    // callers; the eager cost of the default is one columnar count().
    // The bucket cap is the banded-miner hot-bucket bound (see
    // TextDedup.DefaultMaxBucket) — embedding clusters make hot
    // sign-buckets on real data, and the OR-construction across tables
    // keeps recall where one table's bucket is skipped.
    val ppt =
      if (planesPerTable == graft.ops.Adaptive.Auto)
        graft.ops.Adaptive.lshPlanes(emb.count(), floor = 4, cap = 20,
          bucketRows = graft.ops.Adaptive.MinerBucketRows)
      else planesPerTable
    val banded0 = emb.select(col(idCol).as("id"), col(vecCol).as("e"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          signBucket(col(vecCol), t * ppt, ppt, dim).as("bucket"))): _*))
        .as("bb"))
      .select(col("id"), col("e"),
        col("bb.tbl").as("tbl"), col("bb.bucket").as("bucket"))
    val eligible = banded0.groupBy("tbl", "bucket")
      .agg(count(lit(1)).as("__m")).filter(col("__m") <= maxBucket)
      .select("tbl", "bucket")
    val banded = banded0.join(eligible, Seq("tbl", "bucket"))
    val a = banded.select(col("tbl"), col("bucket"),
      col("id").as("vec_a"), col("e").as("ea"))
    val b = banded.select(col("tbl"), col("bucket"),
      col("id").as("vec_b"), col("e").as("eb"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", cosine(col("ea"), col("eb")))
      .filter(col("sim") >= minSim)
      .dropDuplicates("vec_a", "vec_b")
      .select("vec_a", "vec_b", "sim")
      .orderBy("vec_a", "vec_b")
  }

  /** SemDeDup-style semantic deduplication over a trained coarse
    * quantizer (Abbas et al. 2023): every vector is assigned to its
    * max-cosine cell, and within a cell any vector with a LOWER-id
    * neighbor at cosine ≥ `minSim` is dropped — the deterministic
    * keep-lowest-id analog of the paper's one-representative-per-
    * epsilon-ball rule (they keep a random member; an RNG choice would
    * be unverifiable by the oracle). Output: kept (vec_id, cell), by id.
    *
    * Scale shape: assignment is the row-local argmax the IVF search uses
    * (the fused reference-object expression — the corpus never shuffles for it);
    * the within-cell pair join exchanges (vec_id, cell) ONLY, and the
    * per-cell quadratic is the algorithm's own bound — a SemDeDup
    * deployment trains k ∝ corpus size, holding cell populations (and
    * each cell's pairwise block) constant, which is why the paper scales
    * to web corpora. Vectors rejoin the candidate pairs by id (AQE
    * broadcasts the pair side when small), so the codegen'd cosine runs
    * once per within-cell pair and embeddings never ride an exchange. */
  /** (vec_id, e, cell): row-local argmax assignment of every vector to
    * its max-cosine centroid — the shared front half of [[semanticDedup]]
    * and its streaming twin ([[graft.streaming.SemDedupStream]]), so the
    * two cannot drift on the assignment rule. */
  def assignCells(emb: DataFrame, idCol: String, vecCol: String,
                  cents: Array[(Long, Array[Float])]): DataFrame =
    emb.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("e"), cellOf(col(vecCol), cents).as("cell"))

  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    cents: Array[(Long, Array[Float])],
                    minSim: Double = 0.8): DataFrame = {
    val assigned = assignCells(emb, idCol, vecCol, cents)
    val cells = assigned.select("vec_id", "cell")
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
    val v = assigned.select(col("vec_id").as("vid"), col("e"))
    val dups = pairs
      .join(v.select(col("vid").as("va"), col("e").as("ea")), Seq("va"))
      .join(v.select(col("vid").as("vb"), col("e").as("eb")), Seq("vb"))
      .filter(cosine(col("ea"), col("eb")) >= minSim)
      .select(col("vb").as("vec_id"))
    cells.join(dups, Seq("vec_id"), "left_anti").orderBy("vec_id")
  }

  /** D4-style prototypicality audit (Tirumala et al. 2023: after
    * SemDeDup, additionally prune the most PROTOTYPICAL points — those
    * closest to their cluster centroid — because they carry the least
    * marginal information): every vector's cosine similarity to its
    * assigned centroid, its within-cell prototypicality rank (1 = most
    * prototypical, ties toward the smaller id), the cell population,
    * and the keep verdict dropping the top `dropPct`% of each cell
    * under INTEGER arithmetic (`rank > (n·dropPct) div 100` — exact on
    * both engines, no float threshold).
    *
    * Scale shape: assignment is the fused constant-plan [[assignCells]]
    * argmax; the centroid table is a broadcast join; the rank window
    * partitions by CELL, so per-cell work is bounded by cell population
    * — the same per-cell bound SemDeDup's pairwise step already accepts
    * (and this one is linear in it, not quadratic). */
  def prototypicalityPrune(emb: DataFrame, idCol: String, vecCol: String,
                           cents: Array[(Long, Array[Float])],
                           dropPct: Int = 25): DataFrame =
    prototypicalityVerdict(protoScore(emb, idCol, vecCol, cents), dropPct)

  /** The row-local half of [[prototypicalityPrune]]: frozen-quantizer
    * cell assignment + cosine to the OWN centroid. (vec_id, cell,
    * proto_sim) — the scoring shape a streaming twin freezes. */
  def protoScore(emb: DataFrame, idCol: String, vecCol: String,
                 cents: Array[(Long, Array[Float])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cdf = cents.toSeq.toDF("__cid", "__ce")
    assignCells(emb, idCol, vecCol, cents)
      .join(broadcast(cdf), col("cell") === col("__cid"))
      .select(col("vec_id"), col("cell"),
        cosine(col("e"), col("__ce")).as("proto_sim"))
  }

  /** Quantizer assignment-churn audit — the index-maintenance question
    * "if I retrain the coarse quantizer, how much of the corpus moves
    * cells?": every vector's cell under the OLD and NEW quantizer and
    * whether it migrated. A high churn fraction means a retrain forces
    * rewriting most of a cell-partitioned ANN store (p123's layout);
    * a low one means incremental compaction suffices.
    *
    * Scale shape: ONE corpus scan, zero shuffle — both assignments are
    * fused constant-plan [[graft.functions.CellArgmax]] expressions
    * evaluated row-locally side by side; the plan size is constant in
    * both cell counts. */
  def assignmentChurn(emb: DataFrame, idCol: String, vecCol: String,
                      centsOld: Array[(Long, Array[Float])],
                      centsNew: Array[(Long, Array[Float])]): DataFrame =
    emb.select(col(idCol).cast("long").as("vec_id"),
        cellOf(col(vecCol), centsOld).as("cell_old"),
        cellOf(col(vecCol), centsNew).as("cell_new"))
      .withColumn("moved", col("cell_old") =!= col("cell_new"))
      .orderBy("vec_id")

  /** Quantizer inertia audit — the k-means TRAINING-QUALITY report the
    * p62 balance profile (populations) lacks: per cell, the within-cell
    * sum of squared L2 distances to the trained centroid (Lloyd's own
    * objective), its per-vector mean, and the cell's share of total
    * inertia — the table that says WHICH cells are loose (retrain or
    * split candidates) rather than merely big.
    *
    * Exactness: each distance is the bit-equal [[graft.functions.L2Sq]]
    * ordered fold; the SUM is made order-independent by quantizing every
    * distance to 2⁻²⁰ fixed point (⌊d·2²⁰⌋ — a power-of-two multiply is
    * exact) and summing INTEGERS, the house doctrine; mean and share are
    * one double division each. Scale shape: row-local fused assignment +
    * one C-row broadcast centroid join, a partial-aggregable per-cell
    * rollup, and a 1-row total broadcast back for the share. */
  def inertiaReport(emb: DataFrame, idCol: String, vecCol: String,
                    cents: Array[(Long, Array[Float])]): DataFrame =
    inertiaFrom(inertiaPartials(emb, idCol, vecCol, cents))

  /** The per-cell INTEGER partials of [[inertiaReport]] — (cell, n_vecs,
    * sse_q20). Mergeable by construction (integer sums), which is what
    * the streaming twin accumulates as its ≤C-row state. */
  def inertiaPartials(emb: DataFrame, idCol: String, vecCol: String,
                      cents: Array[(Long, Array[Float])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cdf = cents.toSeq.toDF("__cid", "__ce")
    assignCells(emb, idCol, vecCol, cents)
      .join(broadcast(cdf), col("cell") === col("__cid"))
      .select(col("cell"),
        floor(graft.functions.L2Sq(col("e"), col("__ce")) * lit(1048576.0))
          .cast("long").as("__q"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), sum(col("__q")).as("sse_q20"))
  }

  /** The report half of [[inertiaReport]] over (possibly pre-merged)
    * per-cell partials — shared with the streaming twin so batch and
    * stream cannot drift on the mean/share arithmetic. */
  def inertiaFrom(partials: DataFrame): DataFrame = {
    val per = partials.groupBy("cell")
      .agg(sum(col("n_vecs")).as("n_vecs"), sum(col("sse_q20")).as("sse_q20"))
    val tot = per.agg(sum(col("sse_q20")).as("__t"))
    per.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vecs"), col("sse_q20"),
        (col("sse_q20").cast("double") /
          (col("n_vecs") * lit(1048576L)).cast("double")).as("mean_sse"),
        (col("sse_q20").cast("double") / col("__t").cast("double"))
          .as("sse_share"))
      .orderBy("cell")
  }

  /** The corpus-dependent half of [[prototypicalityPrune]]: within-cell
    * rank, cell population, and the integer drop verdict over an
    * already-scored (vec_id, cell, proto_sim) frame. */
  def prototypicalityVerdict(scored: DataFrame, dropPct: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dropPct >= 0 && dropPct <= 100,
      s"prototypicalityPrune: dropPct must be a percentage, got $dropPct")
    val ranked = scored.withColumn("proto_rank", row_number().over(
      Window.partitionBy("cell")
        .orderBy(col("proto_sim").desc, col("vec_id"))))
    val counts = scored.groupBy("cell").agg(count(lit(1)).as("n_cell"))
    ranked.join(counts, "cell")
      .select(col("vec_id"), col("cell"), col("proto_sim"),
        col("proto_rank"), col("n_cell"),
        expr(s"proto_rank > (n_cell * $dropPct) div 100").as("kept"))
      .orderBy("vec_id")
  }
}
