package graft.text

import graft.SparkSpec
import graft.functions.PolyHash

/** [[TextStats.lmSurprisal]] / [[TextStats.surprisalBuckets]] — exhaustive
  * pin against a sequential reference that recomputes the bucketed
  * conditional LM (same [[PolyHash]] fold, same mod-B bucketing, same
  * integer bit-surprisal), plus the split-API identity and the per-language
  * tertile-order invariant of the bucketer. */
class LmSurprisalSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, lit, pmod}

  private val B = TextStats.LmBuckets

  private def run(docs: Seq[(Long, String)], mod: Int = 10) =
    TextStats.lmSurprisal(docs.toDF("doc_id", "text"), "doc_id", "text",
        holdoutMod = mod)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("total_bits"),
          Option(r.getAs[java.lang.Double]("bits_per_bigram"))
            .map(_.doubleValue))))
      .toMap

  /** Sequential reference: normalize, bucket tokens by charHash mod B,
    * pack consecutive pairs, Laplace-smoothed conditional surprisal in
    * whole bits. c1 derives from the bigram counts exactly as the engine
    * derives its broadcast context table. */
  private def reference(docs: Seq[(Long, String)], mod: Int)
      : Map[Long, (Long, Long, Option[Double])] = {
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val bgs = docs.map { case (id, t) =>
      val bs = norm(t).split(" ", -1).toSeq.map(w => PolyHash.hash(w) % B)
      id -> bs.sliding(2).filter(_.size == 2).map(p => p.head * B + p(1)).toSeq
    }
    val c12 = bgs.filter(_._1 % mod != 0).flatMap(_._2)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.groupBy(_._1 / B).map { case (w1, m) => w1 -> m.values.sum }
    def bits(bg: Long): Long = {
      val q = (c1.getOrElse(bg / B, 0L) + B) / (c12.getOrElse(bg, 0L) + 1L)
      63L - java.lang.Long.numberOfLeadingZeros(q)
    }
    bgs.map { case (id, bs) =>
      val n = bs.size.toLong
      val tot = bs.map(bits).sum
      id -> ((n, tot, if (n > 0) Some(tot.toDouble / n) else None))
    }.toMap
  }

  "lmSurprisal" should "match the sequential reference on a hand corpus" in {
    val docs = Seq(1L -> "a b c a b", 2L -> "b c d", 10L -> "a b x y",
      20L -> "q r s", 3L -> "", 4L -> "solo")
    run(docs) shouldBe reference(docs, 10)
  }

  it should "match the sequential reference on random corpora" in {
    val rnd = new scala.util.Random(421)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (0L until 60L).map { id =>
      id -> Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size)))
        .mkString(" ")
    }
    run(docs) shouldBe reference(docs, 10)
  }

  it should "score every bigram of an all-holdout corpus at the 12-bit OOV ceiling" in {
    // every doc_id is 0 mod 10 → empty model → q = B/1 → ⌊log2 4096⌋ = 12
    val out = run(Seq(10L -> "p q r", 20L -> "p q r"))
    out(10L) shouldBe ((2L, 24L, Some(12.0)))
    out(20L) shouldBe ((2L, 24L, Some(12.0)))
  }

  it should "equal lmScore against an lmModel of the train split (the split API pin)" in {
    val docs = Seq(1L -> "a b c a b", 2L -> "b c d", 10L -> "a b x y",
      20L -> "q r s", 3L -> "").toDF("doc_id", "text")
    val fused = TextStats.lmSurprisal(docs, "doc_id", "text")
      .collect().map(_.toSeq)
    val model = TextStats.lmModel(
      docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), "doc_id", "text")
    val split = TextStats.lmScore(docs, "doc_id", "text", model)
      .collect().map(_.toSeq)
    split shouldBe fused
  }

  "surprisalBuckets" should "order head <= middle <= tail within every language and bucket bigram-less docs as none" in {
    val rnd = new scala.util.Random(99)
    val words = Vector("uno", "dos", "tres", "quatro", "cinco", "seis")
    val docs = (0L until 90L).map { id =>
      (id, Seq.fill(2 + rnd.nextInt(10))(words(rnd.nextInt(words.size)))
        .mkString(" "), if (id % 3 == 0) "aa" else "bb")
    } :+ ((90L, "", "aa")) :+ ((91L, "solo", "bb"))
    val out = TextStats.surprisalBuckets(
        docs.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_bigrams"),
        Option(r.getAs[java.lang.Double]("bits_per_bigram"))
          .map(_.doubleValue), r.getAs[String]("ppl_bucket")))
    out.filter(_._3 == 0).map(_._5).toSet shouldBe Set("none")
    for (lang <- Seq("aa", "bb")) {
      val byB = out.filter(o => o._2 == lang && o._3 > 0)
        .groupBy(_._5).view.mapValues(_.flatMap(_._4)).toMap
      (byB.keySet subsetOf Set("head", "middle", "tail")) shouldBe true
      byB.getOrElse("head", Array[Double]()).nonEmpty shouldBe true
      if (byB.contains("middle"))
        byB("head").max should be <= byB("middle").min
      if (byB.contains("tail") && byB.contains("middle"))
        byB("middle").max should be <= byB("tail").min
      // the head cut is the exact tertile: at least ceil(n/3) docs at or
      // below it, and strictly fewer than that strictly below it
      val n = out.count(o => o._2 == lang && o._3 > 0)
      byB("head").length.toLong should be >= ((n + 2) / 3).toLong
    }
  }
}
