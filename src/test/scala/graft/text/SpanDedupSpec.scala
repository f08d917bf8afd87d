package graft.text

import graft.SparkSpec

/** [[TextDedup.spanDedup]] — hand-built span cases plus an exhaustive pin
  * against a sequential string-window reference on random corpora (the
  * reference never hashes, so it also re-derives the semantics the packed
  * two-hash key is standing in for). */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  private def run(docs: Seq[(Long, String)], k: Int = K, minCount: Long = 2L) =
    TextDedup.spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
        spanK = k, minCount = minCount)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("n_removed"), r.getAs[String]("cleaned_text"))))
      .toMap

  /** Sequential reference: window STRINGS (no hashing), global occurrence
    * count, canonical min-(doc, pos) keeper, coverage-union removal. */
  private def reference(docs: Seq[(Long, String)], k: Int, minCount: Int)
      : Map[Long, (Long, Long, Long, String)] = {
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val toks = docs.map { case (id, t) => id -> norm(t).split(" ", -1).toSeq }
    val occ = for {
      (id, tk) <- toks; if tk.length >= k; p <- 0 to tk.length - k
    } yield (tk.slice(p, p + k).mkString(" "), id, p)
    val removals = occ.groupBy(_._1).values.filter(_.size >= minCount)
      .flatMap { os =>
        val keep = os.map(o => (o._2, o._3)).min
        os.map(o => (o._2, o._3)).filter(_ != keep)
      }.toSeq.groupBy(_._1)
    toks.map { case (id, tk) =>
      val starts = removals.getOrElse(id, Seq()).map(_._2)
      val covered = starts.flatMap(s => s until s + k).toSet
      val cleaned = tk.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> ((tk.length.toLong, starts.length.toLong,
        (tk.length - cleaned.length).toLong, cleaned.mkString(" ")))
    }.toMap
  }

  "spanDedup" should "strip an exact duplicate document down to nothing, keeping the canonical copy" in {
    val t = "a1 a2 a3 a4 a5 a6 a7 a8"
    val out = run(Seq(1L -> t, 2L -> t))
    out(1L) shouldBe ((8L, 0L, 0L, t))
    out(2L) shouldBe ((8L, 1L, 8L, ""))
  }

  it should "remove exactly a shared mid-document run, merging overlapping windows" in {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10 tokens → 3 dup windows
    val a = s"left1 left2 $shared right1 right2"
    val b = s"other1 other2 other3 $shared tail1"
    val out = run(Seq(1L -> a, 2L -> b))
    out(1L) shouldBe ((14L, 0L, 0L, a)) // canonical occurrences live in doc 1
    out(2L) shouldBe ((14L, 3L, 10L, "other1 other2 other3 tail1"))
  }

  it should "dedupe a repeated span WITHIN one document, keeping the first occurrence" in {
    val span = (1 to K).map(i => s"x$i").mkString(" ")
    val out = run(Seq(5L -> s"$span bridge $span"))
    out(5L) shouldBe ((17L, 1L, 8L, s"$span bridge"))
  }

  it should "leave documents shorter than the span untouched even when identical" in {
    val out = run(Seq(1L -> "tiny doc", 2L -> "tiny doc", 3L -> "",
      4L -> null.asInstanceOf[String]))
    out(1L) shouldBe ((2L, 0L, 0L, "tiny doc"))
    out(2L) shouldBe ((2L, 0L, 0L, "tiny doc"))
    out(3L) shouldBe ((1L, 0L, 0L, "")) // "" normalizes to one empty token
    out(4L) shouldBe ((1L, 0L, 0L, "")) // null text ≡ empty text
  }

  it should "respect minCount above two" in {
    val t = "b1 b2 b3 b4 b5 b6 b7 b8"
    val twice = Seq(1L -> t, 2L -> t)
    run(twice, minCount = 3L)(2L) shouldBe ((8L, 0L, 0L, t))
    val thrice = twice :+ (3L -> t)
    val out = run(thrice, minCount = 3L)
    out(2L) shouldBe ((8L, 1L, 8L, ""))
    out(3L) shouldBe ((8L, 1L, 8L, ""))
  }

  "spanScrub" should "remove exactly the benchmark-overlapping spans from the corpus" in {
    import spark.implicits.localSeqToDatasetHolder
    val bench = Seq(100L -> (1 to 10).map(i => s"b$i").mkString(" "))
      .toDF("doc_id", "text") // 10 tokens → 3 distinct 8-token windows
    val contaminated = s"intro1 intro2 ${(1 to 10).map(i => s"b$i").mkString(" ")} outro1"
    val clean = "c1 c2 c3 c4 c5 c6 c7 c8 c9"
    val out = TextDedup.spanScrub(
        Seq(1L -> contaminated, 2L -> clean).toDF("doc_id", "text"),
        bench, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_contaminated_spans"),
          r.getAs[Long]("n_removed"), r.getAs[String]("cleaned_text"))))
      .toMap
    out(1L) shouldBe ((13L, 3L, 10L, "intro1 intro2 outro1"))
    out(2L) shouldBe ((9L, 0L, 0L, clean)) // no benchmark window, untouched
    out.contains(100L) shouldBe false // benchmark rows are not output
  }

  "spanDedup's plan" should "share ONE window-key exchange between the count aggregate and the removal join (plan lock)" in {
    // the scale-critical shape: the occurrence index (fold + explode) must
    // be computed once and read by both consumers through exchange reuse,
    // and only the fold branch + the cleanup branch may scan the source —
    // 2 scans, 1 ReusedExchange. AQE applies the same reuse at runtime via
    // its stage cache (same canonicalization); asserting on the non-AQE
    // static plan keeps the lock deterministic. If an edit reintroduces a
    // consumer-splitting inferred filter (the ngramJaccardCounting trap),
    // this fails loudly.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val docs = s2.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextDedup.spanDedup(docs, "doc_id", "text")
      .queryExecution.executedPlan
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)
    val all = nodes(plan)
    all.count(_.isInstanceOf[FileSourceScanExec]) shouldBe 2
    all.count(_.isInstanceOf[ReusedExchangeExec]) shouldBe 1
  }

  it should "match the sequential reference exactly on random dup-heavy corpora" in {
    val rnd = new scala.util.Random(2026)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    for (trial <- 1 to 3) {
      val base = Seq.tabulate(30) { i =>
        i.toLong -> Seq.fill(rnd.nextInt(26))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // plant exact duplicates so cross-document spans are guaranteed
      val docs = base ++ Seq(100L -> base(3)._2, 101L -> base(7)._2)
      val k = 3
      withClue(s"trial $trial: ") {
        run(docs, k = k) shouldBe reference(docs, k, 2)
      }
    }
  }

  "lineDedup" should "keep the first occurrence of each duplicated line corpus-wide" in {
    // "cookie banner" shared by all three docs (keep-first in doc 1),
    // a within-doc duplicate in doc 2, and blank/whitespace lines that
    // never key (they are dropped from output entirely)
    val docs = Seq(
      (1L, "cookie banner\nunique one\n\ncookie banner"),
      (2L, "unique two\ncookie banner\nrepeat me\nrepeat me"),
      (3L, "   \ncookie banner\nunique three  "))
    val out = TextDedup.lineDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned_text")))).toMap
    // doc 1: 3 nonempty lines; its SECOND "cookie banner" is a dup of
    // its own first (the keeper) and goes
    out(1L) shouldBe ((3L, 1L, "cookie banner\nunique one"))
    // doc 2: banner removed (doc 1 keeps it), second "repeat me" removed
    out(2L) shouldBe ((4L, 2L, "unique two\nrepeat me"))
    // doc 3: whitespace-only line dropped pre-keying; trailing spaces
    // trimmed; banner removed
    out(3L) shouldBe ((2L, 1L, "unique three"))
  }

  it should "leave a corpus of distinct lines untouched" in {
    val docs = Seq((1L, "alpha one\nbeta two"), (2L, "gamma three"))
    val out = TextDedup.lineDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("n_removed"),
        r.getAs[String]("cleaned_text")))
    out.toSeq shouldBe Seq((0L, "alpha one\nbeta two"), (0L, "gamma three"))
  }

  "dupSpanExtents" should "report maximal extents in every occurrence, keepers included" in {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val s2 = "one two three four five six seven eight"
    val docs = Seq(
      10L -> (shared + " ua1 ua2 ua3"),              // extent [0, 12)
      11L -> ("ub1 ub2 " + shared),                  // extent [2, 14)
      // an 8-token run duplicated WITHIN one doc, 9 unique fillers apart:
      // two disjoint extents [0, 8) and [17, 25), one window each
      12L -> (s2 + " f1 f2 f3 f4 f5 f6 f7 f8 f9 " + s2))
    val out = TextDedup.dupSpanExtents(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens"),
        r.getAs[Long]("n_windows"), r.getAs[String]("span_text")))
    out.toSeq shouldBe Seq(
      // the 12-token run yields 5 windows merging to ONE extent, and it
      // is reported in BOTH documents — the keeper too (spanDedup's
      // removal view would exclude doc 10's copy)
      (10L, 0L, 12L, 12L, 5L, shared),
      (11L, 2L, 14L, 12L, 5L, shared),
      (12L, 0L, 8L, 8L, 1L, s2),
      (12L, 17L, 25L, 8L, 1L, s2))
  }

  it should "merge coverage-adjacent windows into one extent" in {
    // a 16-token duplicated run: duplicated window starts 0..8 include
    // the exactly-adjacent pair (0, 8) — coverage [0,8)∪[8,16) is one
    // contiguous run and must NOT split
    val r16 = (1 to 16).map(i => s"tok$i").mkString(" ")
    val docs = Seq(20L -> r16, 21L -> (r16 + " uq1 uq2"))
    val out = TextDedup.dupSpanExtents(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
    out.toSeq shouldBe Seq((20L, 0L, 16L), (21L, 0L, 16L))
  }
}
