package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextDedup

/** Unit contract on [[DedupGroupStream.incrementalDelta]] — the
  * contract-then-relabel core the streaming sink runs per micro-batch.
  * The parity gate (StreamingParitySpec) pins the end-to-end stream ≡
  * batch equivalence; this spec pins the DELTA itself on the merge
  * shapes that make incremental CC subtle, asserting both correctness
  * (prev ⊕ delta ≡ batch CC over all pairs) and minimality (rows only
  * for additions and actual label changes — untouched groups never
  * reappear in a delta). */
class DedupGroupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def assignment(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("doc_id", "group_id")

  private def delta(prev: Seq[(Long, Long)],
                    fresh: Seq[(Long, Long)]): Map[Long, Long] =
    DedupGroupStream.incrementalDelta(
        fresh.toDF("doc_a", "doc_b"), assignment(prev))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** prev overridden by delta must equal batch CC over prior ∪ fresh
    * pairs; `priorPairs` regenerates the edges prev was built from. */
  private def checkAgainstBatch(prev: Seq[(Long, Long)],
                                priorPairs: Seq[(Long, Long)],
                                fresh: Seq[(Long, Long)]): Unit = {
    val d = delta(prev, fresh)
    val applied = prev.toMap ++ d
    val batch = TextDedup.duplicateGroups(
        (priorPairs ++ fresh).toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    applied shouldBe batch
  }

  "incrementalDelta" should "assign new endpoints without touching existing groups" in {
    val prev = Seq(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L)
    val d = delta(prev, Seq(20L -> 21L))
    d shouldBe Map(20L -> 20L, 21L -> 20L)
    checkAgainstBatch(prev, Seq(1L -> 2L, 10L -> 11L), Seq(20L -> 21L))
  }

  it should "relabel every member of a group merged into a smaller one, and only those" in {
    val prev = Seq(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 30L -> 30L, 31L -> 30L)
    // 2–10 glues {1,2} and {10,11}; {30,31} must not appear in the delta
    val d = delta(prev, Seq(2L -> 10L))
    d shouldBe Map(10L -> 1L, 11L -> 1L)
    checkAgainstBatch(prev, Seq(1L -> 2L, 10L -> 11L, 30L -> 31L), Seq(2L -> 10L))
  }

  it should "fuse two old groups through a chain of brand-new nodes" in {
    val prev = Seq(5L -> 5L, 6L -> 5L, 10L -> 10L, 11L -> 10L)
    // 6–100, 100–101, 101–11: the merge is only visible transitively
    val d = delta(prev, Seq(6L -> 100L, 100L -> 101L, 101L -> 11L))
    d shouldBe Map(100L -> 5L, 101L -> 5L, 10L -> 5L, 11L -> 5L)
    checkAgainstBatch(prev, Seq(5L -> 6L, 10L -> 11L),
      Seq(6L -> 100L, 100L -> 101L, 101L -> 11L))
  }

  it should "relabel BOTH groups when a new node undercuts their min ids" in {
    val prev = Seq(5L -> 5L, 6L -> 5L, 10L -> 10L, 11L -> 10L)
    // node 1 < every existing id bridges the two groups: all members move
    val d = delta(prev, Seq(5L -> 1L, 1L -> 10L))
    d shouldBe Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 10L -> 1L, 11L -> 1L)
    checkAgainstBatch(prev, Seq(5L -> 6L, 10L -> 11L), Seq(5L -> 1L, 1L -> 10L))
  }

  it should "write nothing for pairs inside one existing group, self-pairs, or null ids" in {
    val prev = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L)
    delta(prev, Seq(2L -> 3L, 1L -> 1L)) shouldBe Map.empty
    // null endpoints carry no linkage (the batch operator's contract)
    val withNull = Seq((java.lang.Long.valueOf(2L), java.lang.Long.valueOf(3L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(9L)))
      .toDF("doc_a", "doc_b")
      .select(col("doc_a").cast("long").as("doc_a"), col("doc_b").cast("long").as("doc_b"))
      .filter(col("doc_a").isNotNull && col("doc_b").isNotNull)
    DedupGroupStream.incrementalDelta(withNull, assignment(prev))
      .count() shouldBe 0L
  }

  it should "handle a batch touching an empty endpoint overlap and a merge at once" in {
    val prev = Seq(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L)
    val d = delta(prev, Seq(50L -> 51L, 11L -> 2L))
    d shouldBe Map(50L -> 50L, 51L -> 50L, 10L -> 1L, 11L -> 1L)
    checkAgainstBatch(prev, Seq(1L -> 2L, 10L -> 11L), Seq(50L -> 51L, 11L -> 2L))
  }
}
