package graft.text

import graft.SparkSpec

/** [[TextDedup.scopedDedupReport]] — hand case plus an exhaustive pin
  * against a sequential reference on random corpora with planted
  * duplicates (the reference dedups on normalized TEXT, so it also
  * re-derives what the double-hash key stands in for). */
class ScopedDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String, String)]) =
    TextDedup.scopedDedupReport(docs.toDF("doc_id", "source", "text"),
        "doc_id", "text", "source")
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_removed_scoped"),
          r.getAs[Long]("n_removed_global"),
          r.getAs[Long]("n_cross_scope_extra"))))
      .toMap

  private def reference(docs: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Long, Long)] = {
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val keyed = docs.map { case (id, src, t) => (id, src, norm(t)) }
    val gkeep = keyed.groupBy(_._3).map { case (k, v) => k -> v.map(_._1).min }
    val skeep = keyed.groupBy(d => (d._2, d._3))
      .map { case (k, v) => k -> v.map(_._1).min }
    keyed.groupBy(_._2).map { case (src, v) =>
      src -> ((v.size.toLong,
        v.count(d => d._1 > skeep((src, d._3))).toLong,
        v.count(d => d._1 > gkeep(d._3)).toLong,
        (v.count(d => d._1 > gkeep(d._3)) -
          v.count(d => d._1 > skeep((src, d._3)))).toLong))
    }
  }

  "scopedDedupReport" should "count scoped vs global removals on a hand corpus" in {
    val docs = Seq(
      (1L, "a", "x"), (2L, "a", "x"),         // intra-scope dup: both scopes remove 2
      (3L, "b", "x"),                          // cross-scope only: global removes 3
      (4L, "b", "y"), (5L, "c", "y"),          // cross-scope dup: global removes 5
      (6L, "c", "z"))                          // unique
    val out = run(docs)
    out("a") shouldBe ((2L, 1L, 1L, 0L))
    out("b") shouldBe ((2L, 0L, 1L, 1L))
    out("c") shouldBe ((2L, 0L, 1L, 1L))
  }

  it should "match the sequential reference on random planted corpora" in {
    val rnd = new scala.util.Random(1414)
    val docs = (0L until 120L).map { id =>
      val t = if (rnd.nextInt(3) == 0) s"planted block ${rnd.nextInt(5)}"
              else s"unique text $id ${rnd.nextInt(1000)}"
      (id, s"s${rnd.nextInt(4)}", t)
    }
    run(docs) shouldBe reference(docs)
  }

  it should "never remove more scoped than global, and keep exactly one global keeper per text" in {
    val rnd = new scala.util.Random(77)
    val docs = (0L until 200L).map { id =>
      (id, s"s${id % 7}", s"block ${rnd.nextInt(12)}")
    }
    val out = run(docs)
    out.values.foreach { case (n, s, g, x) =>
      s should be <= g
      x shouldBe (g - s)
      s should be <= n
    }
    val totalGlobal = out.values.map(_._3).sum
    val distinctTexts = docs.map(_._3.trim.toLowerCase).distinct.size
    totalGlobal shouldBe (docs.size - distinctTexts)
  }
}
