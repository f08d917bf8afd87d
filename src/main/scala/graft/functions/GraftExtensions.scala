package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** The SQL-callable surface of graft's codegen'd expressions: one
  * (identifier, info, builder) triple per function, consumed by
  * [[GraftExtensions]] at session build time and by
  * [[GraftFunctions.registerAll]] for an existing session (tests, REPLs).
  * Int-valued parameters must be literals — they parameterize generated
  * code, exactly like the built-in `array_repeat` count. */
object GraftFunctions {

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) =>
      // reject out-of-range instead of silently wrapping (4294967296L → 0)
      if (v != v.toInt) throw new IllegalArgumentException(
        s"$fn expects an Int-range literal parameter, got out-of-range: $v")
      else v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer parameter, got: $other")
  }

  private def arity(fn: String, cs: Seq[Expression], n: Int): Unit =
    require(cs.length == n, s"$fn expects exactly $n arguments, got ${cs.length}")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (cs: Seq[Expression]) => {
        arity("poly_hash", cs, 1); PolyHash(cs.head, 7L, 31L, 1000000007L)
      }),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (cs: Seq[Expression]) => {
        arity("minhash_sig", cs, 2); MinHashSig(cs.head, litInt(cs(1), "minhash_sig"))
      }),
    (new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (cs: Seq[Expression]) => {
        arity("simhash_sig", cs, 2); SimHashSig(cs.head, litInt(cs(1), "simhash_sig"))
      }),
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (cs: Seq[Expression]) => {
        arity("cosine_sim", cs, 2); CosineSim(cs.head, cs(1))
      }),
    (new FunctionIdentifier("gram_stats"),
      new ExpressionInfo(classOf[GramStats].getName, "gram_stats"),
      (cs: Seq[Expression]) => {
        arity("gram_stats", cs, 2); GramStats(cs.head, litInt(cs(1), "gram_stats"))
      }),
    // an AggregateFunction IS an Expression — the analyzer wraps it in an
    // AggregateExpression when it appears in an aggregation context, the
    // same way built-in SQL aggregates register.
    (new FunctionIdentifier("topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk"),
      (cs: Seq[Expression]) => {
        arity("topk", cs, 3); TopKAgg(cs(0), cs(1), litInt(cs(2), "topk"))
      }))

  /** Register every function on an ALREADY-BUILT session (extensions only
    * apply at build time). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (id, info, b) =>
      GraftSqlBridge.registerFunction(spark, id, info, b)
    }
}

/** SQL-surface registration for graft's custom expressions via the
  * sanctioned extension point: add
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and `poly_hash`,
  * `minhash_sig`, `simhash_sig`, `cosine_sim`, `gram_stats` become
  * callable from `spark.sql(...)` alongside the built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
