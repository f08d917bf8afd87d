package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the fused [[graft.functions.RepetitionStats]]
  * expression: on random documents (mixed whitespace, duplicate-prone
  * tiny token alphabet, supplementary-plane and ligature characters) the
  * expression must return exactly what an independent naive Scala
  * reference computes from the same (raw, norm) pair. The norm is taken
  * from the SPARK normText chain — already verified house-wide — so the
  * property isolates the expression's own line/gram logic, including
  * the U+0020-trim, code-point counting, and UTF8 tie-break contracts
  * on inputs the hand fixtures can't enumerate. */
class RepetitionStatsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // tiny alphabet → plenty of duplicate lines and n-grams; includes the
  // UTF-16-vs-UTF8 ordering trap pair (ﬀ U+FB00 vs 😀 U+1F600)
  private val tokenGen = Gen.oneOf("a", "b", "ab", "ba", "😀", "ﬀ", "x7")
  private val sepGen = Gen.oneOf(" ", "\n", "  ", " \n ", "\t", "\n\n")

  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    toks <- Gen.listOfN(n, tokenGen)
    seps <- Gen.listOfN(math.max(0, n - 1), sepGen)
    lead <- Gen.oneOf("", " ", "\n ")
    tail <- Gen.oneOf("", " ", " \n")
  } yield lead + (if (toks.isEmpty) ""
    else toks.head + seps.zip(toks.tail).map { case (s, t) => s + t }.mkString) + tail

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  private def utf8Lt(a: String, b: String): Boolean = {
    val ac = a.codePoints().toArray
    val bc = b.codePoints().toArray
    val n = math.min(ac.length, bc.length)
    var i = 0
    while (i < n) {
      if (ac(i) != bc(i)) return ac(i) < bc(i)
      i += 1
    }
    ac.length < bc.length
  }

  /** Independent reference: plain Scala collections, no shared code with
    * the expression beyond the JDK. */
  private def naive(raw: String, norm: String): Seq[Any] = {
    def spTrim(s: String) =
      s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val lines = raw.split("\n", -1).toSeq.map(spTrim).filter(_.nonEmpty)
    val nLines = lines.length.toLong
    val lineChars = lines.map(cp).sum
    val dist = lines.distinct
    val nDup = nLines - dist.length
    val dupLineFrac = if (nLines == 0L) 0.0 else nDup.toDouble / nLines.toDouble
    val dupLineCharFrac =
      if (lineChars == 0L) 0.0
      else (lineChars - dist.map(cp).sum).toDouble / lineChars.toDouble
    val t = norm.split(" ", -1).toSeq
    val nChars = cp(norm)
    def top(n: Int): (String, Long) = {
      val grams = t.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      if (grams.isEmpty) (null, 0L)
      else {
        val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val maxC = counts.values.max
        val best = counts.collect { case (g, c) if c == maxC => g }
          .reduce((x, y) => if (utf8Lt(x, y)) x else y)
        (best, maxC)
      }
    }
    val (g2, c2) = top(2)
    val (g3, c3) = top(3)
    def gramFrac(g: String, c: Long): Double =
      if (g == null || nChars == 0L) 0.0
      else (c * cp(g)).toDouble / nChars.toDouble
    val g5 = t.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSeq
    val n5 = g5.length.toLong
    val dup5 = n5 - g5.distinct.length
    val dup5Frac = if (n5 == 0L) 0.0 else dup5.toDouble / n5.toDouble
    Seq(nLines, nDup, dupLineFrac, dupLineCharFrac, g2, c2,
      gramFrac(g2, c2), gramFrac(g3, c3), n5, dup5, dup5Frac)
  }

  "RepetitionStats" should "equal the naive reference on random mixed-whitespace unicode docs" in {
    val docs = samples(docGen, 150, 4242L).distinct
    docs.length should be > 100
    val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "raw")
      .withColumn("norm", graft.functions.TextPrims.normText(col("raw")))
    val rows = df.select(col("id"), col("raw"), col("norm"),
        graft.functions.RepetitionStats(col("raw"), col("norm")).as("r"))
      .select(col("id"), col("raw"), col("norm"), col("r.*"))
      .collect()
    rows.length shouldBe docs.length
    rows.foreach { r =>
      val raw = r.getAs[String]("raw")
      val norm = r.getAs[String]("norm")
      val got = Seq(r.getAs[Long]("n_lines"), r.getAs[Long]("n_dup_lines"),
        r.getAs[Double]("dup_line_frac"), r.getAs[Double]("dup_line_char_frac"),
        r.getAs[String]("top_2gram"), r.getAs[Long]("top_2gram_count"),
        r.getAs[Double]("top_2gram_char_frac"),
        r.getAs[Double]("top_3gram_char_frac"),
        r.getAs[Long]("n_5grams"), r.getAs[Long]("n_dup_5grams"),
        r.getAs[Double]("dup_5gram_frac"))
      withClue(s"doc ${r.getAs[Long]("id")} raw=${raw.replace("\n", "\\n")}: ") {
        got shouldBe naive(raw, norm)
      }
    }
  }
}
