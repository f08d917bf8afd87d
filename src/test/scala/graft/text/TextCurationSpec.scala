package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, max}

class TextCurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the old bridge"),
    (2L, "THE quick   brown fox jumps over the lazy dog near the old bridge"),
    (3L, "completely different content about spark engines and shuffle plans"),
    (4L, "spam spam spam spam spam spam spam spam spam spam")
  ).toDF("doc_id", "text")

  "hashSplit" should "assign normalized-identical texts to the same split and stay deterministic" in {
    val a = TextCuration.hashSplit(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val b = TextCuration.hashSplit(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    a shouldBe b
    val byId = a.map(t => t._1 -> t).toMap
    byId(1L)._2 shouldBe byId(2L)._2 // same content hash -> same bucket
    byId(1L)._3 shouldBe byId(2L)._3 // -> same split: no leakage through dupes
    all(a.map(_._2)) should (be >= 0L and be < 1000L)
    a.foreach { case (_, bucket, split) =>
      split shouldBe (if (bucket < 800) "train" else if (bucket < 900) "val" else "test")
    }
  }

  "hashSample" should "be a deterministic content-keyed subset" in {
    val s1 = TextCuration.hashSample(docs, "doc_id", "text", percent = 60)
      .collect().map(_.getLong(0)).toSet
    val s2 = TextCuration.hashSample(docs, "doc_id", "text", percent = 60)
      .collect().map(_.getLong(0)).toSet
    s1 shouldBe s2
    // dupes travel together: either both sampled or neither
    s1.contains(1L) shouldBe s1.contains(2L)
    // percent = 100 keeps everything
    TextCuration.hashSample(docs, "doc_id", "text", percent = 100).count() shouldBe 4L
  }

  "piiScrub" should "count then replace every planted PII family" in {
    val planted = Seq((7L,
      "Reach me at Jane.Doe+spam@Example.COM or +1 (555) 010-7788, " +
        "server 192.168.001.042, account 987654321 thanks")).toDF("doc_id", "text")
    val r = TextCuration.piiScrub(planted, "doc_id", "text").collect().head
    r.getAs[Long]("n_email") shouldBe 1L
    r.getAs[Long]("n_phone") shouldBe 1L
    r.getAs[Long]("n_ipv4") shouldBe 1L
    r.getAs[Long]("n_idnum") shouldBe 1L
    val clean = r.getAs[String]("clean_text")
    clean should include("<EMAIL>")
    clean should include("<PHONE>")
    clean should include("<IP>")
    clean should include("<ID>")
    clean should not include "example.com"
    clean should not include "987654321"
    clean should not include "192.168"
  }

  it should "leave clean text untouched with zero counts" in {
    val r = TextCuration.piiScrub(docs.filter(col("doc_id") === 3L), "doc_id", "text")
      .collect().head
    Seq("n_email", "n_phone", "n_ipv4", "n_idnum").foreach(c => r.getAs[Long](c) shouldBe 0L)
    r.getAs[String]("clean_text") shouldBe
      "completely different content about spark engines and shuffle plans"
  }

  "repetitionStats" should "flag token-spam and pass normal prose" in {
    val m = TextCuration.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    m(4L).getAs[Double]("top_token_ratio") shouldBe 1.0
    m(4L).getAs[Double]("dup_bigram_frac") shouldBe (8.0 / 9.0) +- 1e-12
    m(4L).getAs[Boolean]("keep") shouldBe false
    m(3L).getAs[Boolean]("keep") shouldBe true
    m(3L).getAs[Double]("dup_bigram_frac") shouldBe 0.0
  }

  it should "match the declarative counter twin on adversarial corpora (the CurationStats pin)" in {
    // the codegen expression vs the declarative twin, per the house
    // custom-expression convention: random docs with heavy ties plus the
    // edge shapes (empty text, whitespace runs, unicode symbols, digits)
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    val edge = Seq(
      (9001L, ""), (9002L, "   "), (9003L, "a"), (9004L, "a a a a"),
      (9005L, "héllo wörld ¡sym! 123 123"), (9006L, "x\t\ty\n\nz"),
      (9007L, "!!! ??? ###"), (9008L, "𝄞 music 𝄞 music"))
    val rows = edge ++ (1L to 150L).map { i =>
      val n = 1 + rnd.nextInt(40)
      val vocab = 1 + rnd.nextInt(6)
      (i, (1 to n).map(_ => s"w${rnd.nextInt(vocab)}!").mkString("  "))
    }
    val df = rows.toDF("doc_id", "text")
    val cols = Seq("n_tokens", "top_cnt", "n_bigrams", "n_uniq_bigrams",
      "n_sym", "n_chars")
    val viaExpr = df.select(col("doc_id").as("id"),
        graft.functions.CurationStats(
          graft.functions.TextPrims.normText(col("text"))).as("cs"))
      .select(col("id") +: cols.map(c => col(s"cs.$c").as(c)): _*)
      .collect().map(r => r.getLong(0) -> cols.map(r.getAs[Long])).toMap
    val viaTwin = TextCuration.repetitionCounters(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> cols.map(r.getAs[Long])).toMap
    viaTwin.keySet shouldBe viaExpr.keySet
    viaTwin.foreach { case (id, twin) =>
      withClue(s"doc $id: expr=${viaExpr(id)} twin=$twin\n") {
        viaExpr(id) shouldBe twin
      }
    }
  }

  it should "compute top_token_ratio by sorted run length identically to the distinct-count form" in {
    // the r15 linearization (max run in sort_array == max multiplicity):
    // pin equality against the superseded O(n·distinct) form on random
    // heavy-repeat docs, plus the empty-doc NULL edge both forms share
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map { i =>
      val n = 1 + rnd.nextInt(60)
      val vocab = 1 + rnd.nextInt(8) // tiny vocab -> heavy ties and runs
      (i, (1 to n).map(_ => s"w${rnd.nextInt(vocab)}").mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    val got = TextCuration.repetitionStats(df, "doc_id", "text")
      .select(col("id"), col("top_token_ratio")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (i, text) =>
      val toks = text.split(" ").toSeq
      val expect = toks.groupBy(identity).values.map(_.size).max.toDouble / toks.size
      got(i) shouldBe expect +- 1e-12
    }
  }

  "tokenChunks" should "cover every token and overlap consecutive chunks" in {
    val doc = (1 to 80).map(i => s"w$i").mkString(" ")
    val rows = TextCuration.tokenChunks(Seq((1L, doc)).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
    // stride 24, 80 tokens -> ceil(80/24) = 4 chunks at 0/24/48/72
    rows.map(_.getAs[Long]("start_tok")).toSeq shouldBe Seq(0L, 24L, 48L, 72L)
    rows.map(_.getAs[Long]("n_chunk_tokens")).toSeq shouldBe Seq(32L, 32L, 32L, 8L)
    // coverage: last token of chunk k (start+32) reaches past chunk k+1's
    // start (24(k+1)) by the 8-token overlap; the final chunk ends at 80
    rows.init.foreach { r =>
      r.getAs[Long]("start_tok") + r.getAs[Long]("n_chunk_tokens") should
        be >= (r.getAs[Long]("chunk_idx") + 1) * 24 + 8
    }
    an[IllegalArgumentException] should be thrownBy
      TextCuration.tokenChunks(Seq((1L, doc)).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 32, overlap = -8)
  }

  "sequencePacking" should "produce a strictly increasing global prefix sum and budget-aligned bins" in {
    val docs = (1L to 100L).map(i => (i, Seq.fill(5 + (i % 7).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextCuration.sequencePacking(docs, "doc_id", "text", budgetTokens = 50L)
      .collect()
    rows.length shouldBe 100
    // cum is the exact running sum in id order, independent of partitioning
    var cum = 0L
    rows.sortBy(_.getAs[Long]("id")).foreach { r =>
      cum += r.getAs[Long]("n_tokens")
      r.getAs[Long]("cum_tokens") shouldBe cum
      r.getAs[Long]("bin") shouldBe (cum - r.getAs[Long]("n_tokens")) / 50L
    }
    // bins are non-decreasing in id order
    val bins = rows.sortBy(_.getAs[Long]("id")).map(_.getAs[Long]("bin"))
    bins.zip(bins.tail).foreach { case (a, b) => b should be >= a }
  }

  "ppsSample" should "hit exactly total-div-step thresholds, weighted by token mass" in {
    // aperiodic weights 1..40 (hash-mixed — periodic weights would
    // alias with the systematic step, the documented caveat); ids
    // deliberately unordered on input
    def w(i: Long) = (i * i * 2654435761L % 97 % 40 + 1).toInt
    val docs = (1L to 200L).map(i =>
      (201L - i, Seq.fill(w(201L - i))("w").mkString(" ")))
      .toDF("doc_id", "text")
    val k = 10
    val got = TextCuration.ppsSample(docs, "doc_id", "text", k).collect()
    val total = (1L to 200L).map(w(_).toLong).sum
    val step = total / k
    // systematic PPS: the hit count is exact, not approximate
    got.map(_.getAs[Long]("n_hits")).sum shouldBe total / step
    // every selected doc's cumulative interval really contains a threshold
    got.foreach { r =>
      val (cum, n) = (r.getAs[Long]("cum_tokens"), r.getAs[Long]("n_tokens"))
      (cum / step) should be > (cum - n) / step
    }
    // PPS bias: the token-mass-weighted pick runs heavier than the corpus
    val avgSel = got.map(_.getAs[Long]("n_tokens")).sum.toDouble / got.length
    avgSel should be > total.toDouble / 200
    // deterministic: a second run selects the identical rows
    TextCuration.ppsSample(docs, "doc_id", "text", k).collect()
      .map(_.toSeq) shouldBe got.map(_.toSeq)
  }

  it should "equal a driver-side reference implementation on random corpora" in {
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 5) {
      val nDocs = 50 + rnd.nextInt(150)
      val k = 1 + rnd.nextInt(20)
      val docs = (1L to nDocs).map(i =>
        (i, Seq.fill(1 + rnd.nextInt(30))("w" + rnd.nextInt(5)).mkString(" ")))
      val got = TextCuration.ppsSample(
          docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      // reference: sequential cumsum + threshold containment
      val weights = docs.map { case (id, t) => id -> t.split(" ").length.toLong }
      val total = weights.map(_._2).sum
      val step = math.max(1L, total / k)
      var cum = 0L
      val exp = weights.flatMap { case (id, w) =>
        val hits = (cum + w) / step - cum / step
        cum += w
        if (hits > 0) Some(id -> hits) else None
      }.toMap
      withClue(s"trial=$trial nDocs=$nDocs k=$k: ") { got shouldBe exp }
    }
  }

  "contamination" should "flag exactly the corpus docs sharing a 5-gram with the benchmark" in {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon more words here"), // shares 5-grams
      (2L, "entirely unrelated text with no overlap at all in any window"),
      (3L, "alpha beta gamma delta trailing off early") // only 4-gram overlap
    ).toDF("doc_id", "text")
    val m = TextCuration.contamination(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    m(1L).getAs[Boolean]("is_contaminated") shouldBe true
    m(1L).getAs[Long]("n_hits") shouldBe 1L // "alpha beta gamma delta epsilon"
    m(2L).getAs[Boolean]("is_contaminated") shouldBe false
    m(2L).getAs[Long]("n_hits") shouldBe 0L
    m(3L).getAs[Boolean]("is_contaminated") shouldBe false
    m(1L).getAs[Double]("contamination_ratio") shouldBe
      (1.0 / m(1L).getAs[Long]("n_grams")) +- 1e-12
  }

  "chunkDedup" should "keep the minimum (doc, chunk_idx) occurrence per repeated chunk" in {
    // chunkTokens=4, overlap=0: doc 1 = [A B C D][E F G H]; doc 2 repeats
    // [A B C D] twice; doc 3 is unique
    val d = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d a b c d"),
      (3L, "x y z w q r s t")
    ).toDF("doc_id", "text")
    val out = TextCuration.chunkDedup(d, "doc_id", "text",
        chunkTokens = 4, overlap = 0)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly one repeated chunk hash: "a b c d" ×3 (doc1 idx0, doc2 idx0+1)
    out.toSeq shouldBe Seq((3L, 1L, 0L))
  }

  it should "dedupe across overlap windows and respect minCopies" in {
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f")
    ).toDF("doc_id", "text")
    // chunkTokens=4, overlap=2 → stride 2: windows [a b c d][c d e f][e f]
    // per doc; every window of doc 1 recurs in doc 2
    val out = TextCuration.chunkDedup(d, "doc_id", "text",
        chunkTokens = 4, overlap = 2)
      .collect()
    out.length shouldBe 3
    all(out.map(_.getLong(1))) shouldBe 2L       // n_copies
    all(out.map(_.getLong(2))) shouldBe 1L       // keep_id = doc 1
    // minCopies above the max multiplicity → empty
    TextCuration.chunkDedup(d, "doc_id", "text", chunkTokens = 4,
      overlap = 2, minCopies = 3L).count() shouldBe 0L
  }

  "tokenBudgetSample" should "equal the plain per-key window selection for any numRanges" in {
    val rng = new scala.util.Random(7)
    val rows = (1L to 300L).map { id =>
      (id, s"k${rng.nextInt(3)}", rng.nextInt(50).toLong + 1L)
    }
    val df = rows.toDF("id", "key", "w")
    val budget = 600L
    // sequential reference: per key in id order, keep while start < budget
    val exp = rows.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._1).flatMap { case (id, k, w) =>
        val start = cum; cum += w
        if (start < budget) Some((id, k, w, cum)) else None
      }
    }.sortBy(_._1)
    for (nR <- Seq(1, 3, 32)) {
      val got = TextCuration.tokenBudgetSample(df, "id", "key", "w", budget, nR)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      withClue(s"numRanges=$nR: ") { got shouldBe exp }
    }
    // Auto resolves through the same machinery
    TextCuration.tokenBudgetSample(df, "id", "key", "w", budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq shouldBe exp
  }

  it should "handle an empty input and a budget-1 greedy head per key" in {
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "key", "w")
    TextCuration.tokenBudgetSample(empty, "id", "key", "w", 100L).count() shouldBe 0L
    val d = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "b", 5L)).toDF("id", "key", "w")
    // budget 1: only the first doc of each key (its interval starts at 0)
    TextCuration.tokenBudgetSample(d, "id", "key", "w", 1L)
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 3L)
  }

  "urlParts" should "parse every scheme/www/path/query branch" in {
    val urls = Seq(
      (1L, "https://src1-example.com/en/doc/1"),
      (2L, "http://www.src2-example.com/de/doc/2/extra"),
      (3L, "https://www.src3-example.com/fr/doc/3?ref=feed"),
      (4L, "http://src4-example.com/zh/doc/4/extra?ref=feed"))
      .toDF("doc_id", "url")
    val got = TextCuration.urlParts(urls, "doc_id", "url")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getBoolean(5)))
    got shouldBe Array(
      (1L, "https", "src1-example.com", "src1-example.com", 3L, false),
      (2L, "http", "www.src2-example.com", "src2-example.com", 4L, false),
      (3L, "https", "www.src3-example.com", "src3-example.com", 3L, true),
      (4L, "http", "src4-example.com", "src4-example.com", 4L, true))
  }

  "domainCapSample" should "keep the first cap docs per domain with sequential ranks" in {
    // a hot domain (6 docs) and a cold one (2), interleaved ids
    val d = Seq(1L -> "hot.com", 2L -> "cold.com", 3L -> "hot.com", 4L -> "hot.com",
      5L -> "hot.com", 6L -> "cold.com", 7L -> "hot.com", 8L -> "hot.com")
      .toDF("id", "domain")
    val got = TextCuration.domainCapSample(d, "id", "domain", cap = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    got shouldBe Array(
      (1L, "hot.com", 1L), (2L, "cold.com", 1L), (3L, "hot.com", 2L),
      (4L, "hot.com", 3L), (6L, "cold.com", 2L))
  }

  it should "bite on the synthesized-url corpus at cap 15" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val parts = TextCuration.urlParts(
      graft.ops.DocAnalytics.withUrl(docs), "doc_id", "url")
    val kept = TextCuration.domainCapSample(parts, "id", "domain", cap = 15L)
    val total = docs.count()
    kept.count() should be < total // the cap must actually drop documents
    kept.groupBy("domain").count().agg(max("count")).collect()(0).getLong(0) should be <= 15L
  }

  "bloomSeenProbe" should "never produce a false negative and flag exact matches" in {
    // doc 1 is the seen set; doc 2 normalizes to the same text -> same
    // fingerprint -> is_seen (content identity, the dedup semantics)
    val out = TextCuration.bloomSeenProbe(docs, "doc_id", "text",
        col("doc_id") === 1L)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    out(1L) shouldBe ((true, true))
    out(2L) shouldBe ((true, true))
    // Bloom invariant: is_seen -> maybe_seen on every row
    out.values.foreach { case (maybe, is) => if (is) maybe shouldBe true }
  }

  it should "produce false positives when the filter saturates, never false negatives" in {
    // mBits = 1: every position is bit 0, so one seen doc sets the whole
    // filter and every distinct text becomes a false positive
    val out = TextCuration.bloomSeenProbe(docs, "doc_id", "text",
        col("doc_id") === 1L, mBits = 1L)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    out(3L) shouldBe ((true, false)) // saturated filter: maybe, not seen
    out(4L) shouldBe ((true, false))
    out(1L) shouldBe ((true, true))
  }

  it should "report real false positives at the p108 config on the test corpus" in {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextCuration.bloomSeenProbe(corpus, "doc_id", "text",
      col("doc_id") < 25)
    out.filter(col("is_seen") && !col("maybe_seen")).count() shouldBe 0L
    // the 64-bit filter must be small enough that FP semantics are
    // exercised (not vacuously green) at the smallest test scale
    out.filter(col("maybe_seen") && !col("is_seen")).count() should be > 0L
  }

  "semanticPacking" should "restart the token prefix sum and bin cut per cell" in {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"), (1L, "d e"), (2L, "f g h i"), (3L, "j k l m n o")
    ).toDF("doc_id", "text")
    // docs 0,1,3 share a cell; doc 2 is alone — its cum must restart
    val cells = Seq((0L, 7L), (1L, 7L), (2L, 9L), (3L, 7L))
      .toDF("vec_id", "cell")
    val out = TextCuration.semanticPacking(docs, "doc_id", "text", cells,
        budgetTokens = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    out.toSeq shouldBe Seq(
      (0L, 7L, 3L, 3L, 0L),  // starts at offset 0 -> bin 0
      (1L, 7L, 2L, 5L, 0L),  // starts at offset 3 < 4 -> still bin 0
      (2L, 9L, 4L, 4L, 0L),  // own cell: prefix sum restarted
      (3L, 7L, 6L, 11L, 1L)) // starts at offset 5 -> bin 1
  }

  it should "reject a non-positive budget" in {
    import spark.implicits._
    val docs = Seq((0L, "a")).toDF("doc_id", "text")
    val cells = Seq((0L, 0L)).toDF("vec_id", "cell")
    an[IllegalArgumentException] should be thrownBy
      TextCuration.semanticPacking(docs, "doc_id", "text", cells, budgetTokens = 0L)
  }

  it should "survive a degenerate one-cell quantizer via the bucketed prefix sum" in {
    // the two-level decomposition's reason to exist: a quantizer that
    // collapses every doc into ONE cell must not funnel a single window
    // partition — force many id-range buckets and pin the output against
    // the plain per-cell running sum
    import spark.implicits._
    val docs = (0L until 64L).map(i => (i, ("w " * (i % 5 + 1).toInt).trim)).toDF("doc_id", "text")
    val cells = (0L until 64L).map(i => (i, 0L)).toDF("vec_id", "cell")
    val out = TextCuration.semanticPacking(docs, "doc_id", "text", cells,
        budgetTokens = 7L, numRanges = 8)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    var cum = 0L
    val expected = (0L until 64L).map { i =>
      val n = i % 5 + 1
      cum += n
      (i, cum, (cum - n) / 7L)
    }
    out.toSeq shouldBe expected
  }

  "evalDirtiness" should "flag benchmark examples whose grams leak from the corpus" in {
    import spark.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "completely unrelated corpus content filler words here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (0L, "quick brown fox jumps over"),          // its one 5-gram leaks
      (1L, "zebra yak xylophone wombat vulture emu") // 2 grams, no leak
    ).toDF("doc_id", "text")
    val out = TextCuration.evalDirtiness(corpus, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    out.toSeq shouldBe Seq(
      (0L, 1L, 1L, 1.0, true),
      (1L, 2L, 0L, 0.0, false))
  }

  it should "probe the corpus through broadcast joins (the corpus never shuffles)" in {
    import spark.implicits._
    val corpus = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq((0L, "b c d e f")).toDF("doc_id", "text")
    val plan = TextCuration.evalDirtiness(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    // the corpus-side probe must be the SEMI join, not an equi-join that
    // would hold corpus grams past the filter
    plan should include("LeftSemi")
  }

  "unimaxAllocation" should "cap small keys and water-fill the rest (hand-computed)" in {
    import spark.implicits._
    // masses 10 / 20 / 100 tokens, cap 2 epochs, budget 150:
    // ascending caps (20, 40, 200) -> a capped (20*3=60<=150), b capped
    // (40*2=80<=130), c uncapped -> gets 150-60=90 -> 0.9 epochs
    val docs = Seq(
      (0L, ("x " * 10).trim, "a"), (1L, ("x " * 20).trim, "b"),
      (2L, ("x " * 100).trim, "c")
    ).toDF("doc_id", "text", "lang")
    val out = TextCuration.unimaxAllocation(docs, "doc_id", "lang", "text",
        budgetTokens = 150L, maxEpochs = 2L)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getBoolean(4),
        r.getDouble(5), r.getDouble(6)))
    out.toSeq shouldBe Seq(
      ("a", 20L, true, 20.0, 2.0),
      ("b", 40L, true, 40.0, 2.0),
      ("c", 200L, false, 90.0, 0.9))
  }

  it should "cap everything when the budget exceeds total cap mass, cap nothing when equal shares fit all" in {
    import spark.implicits._
    val docs = Seq(
      (0L, ("x " * 10).trim, "a"), (1L, ("x " * 20).trim, "b"),
      (2L, ("x " * 100).trim, "c")
    ).toDF("doc_id", "text", "lang")
    val allCapped = TextCuration.unimaxAllocation(docs, "doc_id", "lang",
        "text", budgetTokens = 400L, maxEpochs = 2L)
      .collect().map(r => (r.getBoolean(4), r.getDouble(5)))
    allCapped.toSeq shouldBe Seq((true, 20.0), (true, 40.0), (true, 200.0))
    // budget 30: smallest cap 20*3=60 > 30 -> nothing capped, 10 each
    val noneCapped = TextCuration.unimaxAllocation(docs, "doc_id", "lang",
        "text", budgetTokens = 30L, maxEpochs = 2L)
      .collect().map(r => (r.getBoolean(4), r.getDouble(5), r.getDouble(6)))
    noneCapped.toSeq shouldBe Seq(
      (false, 10.0, 1.0), (false, 10.0, 0.5), (false, 10.0, 0.1))
  }

  it should "satisfy the water-filling invariants on random mass profiles" in {
    import spark.implicits._
    val rnd = new scala.util.Random(155)
    (1 to 5).foreach { _ =>
      val c = 3 + rnd.nextInt(5)
      val masses = (0 until c).map(_ => 1 + rnd.nextInt(400))
      val docs = masses.zipWithIndex.map { case (mTok, i) =>
        (i.toLong, ("x " * mTok).trim, f"k$i%02d") }.toDF("doc_id", "text", "lang")
      val e = 1 + rnd.nextInt(3)
      val totalCap = masses.map(_.toLong).sum * e
      val b = (totalCap * (50 + rnd.nextInt(100))) / 100 // 0.5x..1.5x cap mass
      val rows = TextCuration.unimaxAllocation(docs, "doc_id", "lang", "text",
          budgetTokens = b, maxEpochs = e.toLong)
        .collect().map(r => (r.getLong(3), r.getBoolean(4), r.getDouble(5)))
      val eps = 1e-6
      // no allocation exceeds its epoch cap
      rows.foreach { case (cap, _, alloc) => alloc should be <= cap + eps }
      // the budget is exhausted unless every key capped first
      val spent = rows.map(_._3).sum
      if (rows.forall(_._2)) spent shouldBe totalCap.toDouble +- 1e-3
      else spent shouldBe math.min(b, totalCap).toDouble +- 1e-3
      // every uncapped key receives the same equal share
      val shares = rows.filterNot(_._2).map(_._3)
      if (shares.nonEmpty) shares.max shouldBe shares.min +- eps
      // no capped key's cap exceeds the uncapped share (else it would
      // not have been capped)
      if (shares.nonEmpty)
        rows.filter(_._2).foreach { case (cap, _, _) =>
          cap.toDouble should be <= shares.min + eps }
    }
  }

  "groupAwareSplit" should "keep every duplicate group in one split and leave singletons on their hashSplit row" in {
    import spark.implicits._
    val docs = Seq(
      (0L, "completely original content about gardens"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "another standalone document on sailing ships")
    ).toDF("doc_id", "text")
    val groups = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "group_id")
    val out = TextCuration.groupAwareSplit(docs, "doc_id", "text", groups)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the planted pair shares the representative's bucket AND split
    out(1L) shouldBe out(2L)
    out(1L)._1 shouldBe 1L
    // singletons are exactly their hashSplit assignment
    val solo = TextCuration.hashSplit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    Seq(0L, 3L).foreach { id =>
      out(id)._1 shouldBe id
      (out(id)._2, out(id)._3) shouldBe solo(id)
    }
    // and the grouped docs' shared row IS the representative's solo row
    (out(2L)._2, out(2L)._3) shouldBe solo(1L)
  }
}
