package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial string hash: fold
  * `h = (h * 31 + codepoint) mod 1e9+7` over the string's code points,
  * seed 7 — exactly [[TextPrims.charHash]]'s
  * `aggregate(split(s, ''), 7, (a, c) -> (a*31 + ascii(c)) % P)` and its
  * DuckDB list_reduce twin, but evaluated as a tight generated-Java loop
  * instead of an interpreted higher-order-function tree (one lambda-frame
  * per character).
  *
  * Why a custom Expression (the only place the engine needs one): the hash
  * sits in the innermost loop of every dedup/fingerprint operator —
  * per shingle, per token, per gram — and interpreted HOF evaluation
  * dominated those operators' profiles. Everything else in the engine
  * stays built-in.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 7L;
         |if ($s.isEmpty()) {
         |  $h = 217L;  // split('') yields one empty element — see PolyHash.hash
         |} else {
         |  int $i = 0;
         |  while ($i < $s.length()) {
         |    int $cp = $s.codePointAt($i);
         |    $h = ($h * 31L + $cp) % 1000000007L;
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
    * string hashes to (7*31+0) mod P = 217, because the executable spec —
    * `aggregate(split(s, ''), …)` in Spark and `string_split(s, '')` in
    * DuckDB — both produce one empty element (codepoint 0) for '', and the
    * oracles were pinned on that behavior. */
  def hash(s: String): Long = {
    if (s.isEmpty) return 217L
    var h = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /** Column wrapper. */
  def apply(c: Column): Column = GraftSqlBridge.column(PolyHash(GraftSqlBridge.expression(c)))
}
