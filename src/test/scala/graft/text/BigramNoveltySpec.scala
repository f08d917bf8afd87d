package graft.text

import graft.SparkSpec

/** [[TextStats.bigramNovelty]] — hand-counted cases plus an exhaustive pin
  * against a sequential string-bigram reference on random corpora (the
  * reference never hashes, so it also re-derives what the packed two-hash
  * bigram key stands in for). */
class BigramNoveltySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, lit, pmod}

  private def run(docs: Seq[(Long, String)], mod: Int = 10) =
    TextStats.bigramNovelty(docs.toDF("doc_id", "text"), "doc_id", "text",
        holdoutMod = mod)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("support_sum"),
          Option(r.getAs[java.lang.Double]("avg_support")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("oov_rate")).map(_.doubleValue))))
      .toMap

  private def reference(docs: Seq[(Long, String)], mod: Int)
      : Map[Long, (Long, Long, Long, Option[Double], Option[Double])] = {
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val bigrams = docs.map { case (id, t) =>
      id -> norm(t).split(" ", -1).toSeq.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
    }
    val c2 = bigrams.filter(_._1 % mod != 0).flatMap(_._2)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    bigrams.map { case (id, bgs) =>
      val n = bgs.size.toLong
      val sup = bgs.map(b => c2.getOrElse(b, 0L)).sum
      val oov = bgs.count(b => !c2.contains(b)).toLong
      id -> ((n, oov, sup,
        if (n > 0) Some(sup.toDouble / n) else None,
        if (n > 0) Some(oov.toDouble / n) else None))
    }.toMap
  }

  "bigramNovelty" should "count support from the train split and flag unseen bigrams as OOV" in {
    val out = run(Seq(1L -> "a b c", 10L -> "a b d"))
    out(1L) shouldBe ((2L, 0L, 2L, Some(1.0), Some(0.0))) // (a b)=1, (b c)=1
    // holdout doc: (a b) seen once in training, (b d) never
    out(10L) shouldBe ((2L, 1L, 1L, Some(0.5), Some(0.5)))
  }

  it should "count repeated bigrams with multiplicity on both sides" in {
    val out = run(Seq(1L -> "x y x y", 2L -> "x y z"))
    // train counts: (x y)=3 [twice in doc 1, once in doc 2], (y x)=1, (y z)=1
    out(1L) shouldBe ((3L, 0L, 7L, Some(7.0 / 3), Some(0.0)))
    out(2L) shouldBe ((2L, 0L, 4L, Some(2.0), Some(0.0)))
  }

  it should "score sub-bigram documents as zeros with null rates" in {
    val out = run(Seq(1L -> "a b c", 2L -> "solo", 3L -> ""))
    out(2L) shouldBe ((0L, 0L, 0L, None, None))
    out(3L) shouldBe ((0L, 0L, 0L, None, None)) // "" → one empty token, no bigram
  }

  it should "give holdout-only bigrams zero support" in {
    // both docs are holdout (pmod 10 == 0) → the model is empty
    val out = run(Seq(10L -> "p q r", 20L -> "p q r"))
    out(10L) shouldBe ((2L, 2L, 0L, Some(0.0), Some(1.0)))
    out(20L) shouldBe ((2L, 2L, 0L, Some(0.0), Some(1.0)))
  }

  it should "equal bigramScore against a bigramModel of the train split (the split API pin)" in {
    val docs = Seq(1L -> "a b c a b", 2L -> "b c d", 10L -> "a b x y",
      20L -> "q r s", 3L -> "").toDF("doc_id", "text")
    val fused = TextStats.bigramNovelty(docs, "doc_id", "text").collect().map(_.toSeq)
    val model = TextStats.bigramModel(
      docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), "doc_id", "text")
    val split = TextStats.bigramScore(docs, "doc_id", "text", model)
      .collect().map(_.toSeq)
    split shouldBe fused
  }

  it should "match the sequential reference exactly on random corpora" in {
    val rnd = new scala.util.Random(2027)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    for (trial <- 1 to 3) {
      val docs = Seq.tabulate(40) { i =>
        i.toLong -> Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      withClue(s"trial $trial: ") {
        run(docs) shouldBe reference(docs, 10)
      }
    }
  }
}
