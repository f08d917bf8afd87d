package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-free, cache-free materialization boundary.
  *
  * The problem it solves: Catalyst's CollapseProject inlines an aliased
  * expression into EVERY downstream reference —
  * `select(hof.as("h")).select(f($"h"), g($"h"))` evaluates `hof` twice per
  * row, and a reference inside `transform(sequence(0, N), j -> … h …)`
  * evaluates it once per j per row. For the higher-order-function arrays
  * the dedup/fingerprint operators build (token hashes, shingle sets,
  * MinHash signatures) that recompute is catastrophic, and there is no
  * common-subexpression elimination across collapsed projections to save
  * it.
  *
  * Earlier rounds used `persist()` as the boundary, which computes once but
  * leaks session-lifetime cache (and under cache pressure the blocks evict
  * and the trap returns). This helper instead routes the computed columns
  * through `explode(array(struct(…)))`: a `Generate` node, which
  * CollapseProject cannot cross, so each expression is evaluated exactly
  * once per row and downstream projections reference the generated struct's
  * fields as plain attributes. A single-element array never adds or drops
  * rows, `Generate` participates in whole-stage codegen, the values live
  * only inside the row pipeline (no storage, no shuffle, nothing to
  * unpersist), and filters on pass-through columns still push through to
  * the scan — this is the boundary you'd want at 100 TB.
  */
object Barrier {

  /** Evaluate each `computed` expression exactly once per row, yielding
    * `keep` pass-through columns plus one column per computed entry. */
  def once(df: DataFrame, keep: Seq[String], computed: (String, Column)*): DataFrame = {
    val gen = explode(array(struct(computed.map { case (n, c) => c.as(n) }: _*)))
    df.select(keep.map(col) :+ gen.as("__once"): _*)
      .select(keep.map(col) ++ computed.map { case (n, _) => col(s"__once.$n").as(n) }: _*)
  }
}
