package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial string hash: fold
  * `h = (h * mult + codepoint) mod modulus` over the string's code points —
  * exactly [[TextPrims.charHash]]'s
  * `aggregate(split(s, ''), seed, (a, c) -> (a*mult + ascii(c)) % modulus)`
  * and its DuckDB list_reduce twin, but evaluated as a tight generated-Java
  * loop instead of an interpreted higher-order-function tree (one
  * lambda-frame per character).
  *
  * The default parameters (7, 31, 1e9+7) are the engine-wide `charHash`;
  * the dedup operators also instantiate a second independent family
  * (11, 37, 998244353) so exact dedup keys on a ~2^60 combined space.
  * `modulus * mult + maxCodePoint` must stay below 2^63 (no silent Java
  * overflow wrap — the DuckDB twin would error instead, and the two
  * engines must agree bit-for-bit).
  *
  * Why a custom Expression (the only place the engine needs one): the hash
  * sits in the innermost loop of every dedup/fingerprint operator —
  * per shingle, per token, per gram — and interpreted HOF evaluation
  * dominated those operators' profiles. Everything else in the engine
  * stays built-in.
  */
case class PolyHash(child: Expression, seed: Long, mult: Long, modulus: Long)
    extends UnaryExpression {

  require(modulus > 0 && mult > 0 && seed >= 0,
    "poly_hash requires modulus > 0, mult > 0, seed >= 0")
  // seed < modulus keeps the first-iteration seed*mult product inside the
  // same bound the per-step guard below proves for (h mod modulus)*mult
  require(seed < modulus,
    s"poly_hash seed=$seed must be < modulus=$modulus or seed*mult may overflow")
  require(modulus <= (Long.MaxValue - 0x10FFFF) / mult,
    s"poly_hash(seed=$seed, mult=$mult, mod=$modulus) could overflow a long")

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString, seed, mult, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = ${seed}L;
         |if ($s.isEmpty()) {
         |  // split('') yields one empty element (codepoint 0) — see PolyHash.hash
         |  $h = (${seed}L * ${mult}L) % ${modulus}L;
         |} else {
         |  int $i = 0;
         |  while ($i < $s.length()) {
         |    int $cp = $s.codePointAt($i);
         |    $h = ($h * ${mult}L + $cp) % ${modulus}L;
         |    $i += Character.charCount($cp);
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Reference implementation (also used for interpreted eval). The empty
    * string hashes to (seed*mult + 0) mod modulus — 217 for the default
    * family — because the executable spec — `aggregate(split(s, ''), …)` in
    * Spark and `string_split(s, '')` in DuckDB — both produce one empty
    * element (codepoint 0) for '', and the oracles were pinned on that
    * behavior. */
  def hash(s: String, seed: Long = 7L, mult: Long = 31L, modulus: Long = 1000000007L): Long = {
    if (s.isEmpty) return (seed * mult) % modulus
    var h = seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * mult + cp) % modulus
      i += Character.charCount(cp)
    }
    h
  }

  /** Column wrapper, default (charHash) family. */
  def apply(c: Column): Column = apply(c, 7L, 31L, 1000000007L)

  /** Column wrapper, explicit hash family. */
  def apply(c: Column, seed: Long, mult: Long, modulus: Long): Column =
    GraftSqlBridge.column(PolyHash(GraftSqlBridge.expression(c), seed, mult, modulus))
}
