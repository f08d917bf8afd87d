package graft.sources

import org.apache.spark.sql.SparkSession
import scala.util.{Failure, Success, Try}

/** Data-contract preflight (round-10 postmortem: the driver regenerated
  * `/root/testdata` with `events.ts` re-encoded from TIMESTAMP(NANOS) to
  * timestamp[us], and 41 queries died one by one as analysis exceptions).
  *
  * [[probe]] reads ONLY parquet footers (no data scan — `spark.read.parquet`
  * schema resolution) and diffs each table against the committed expectation
  * below, returning one human-readable line per drift. Callers (Verify/Bench)
  * print the lines and record them in their error artifacts, then still run
  * every query: a drifted column only breaks the queries that touch it, so a
  * hard stop here would needlessly darken the untouched surface.
  *
  * The accepted-type sets are deliberately a little wide where the engine is
  * genuinely tolerant: every `ts`-shaped column accepts all three encodings
  * [[Tables.normalizeTs]] handles (nanos-as-long under the legacy conf,
  * TIMESTAMP, TIMESTAMP_NTZ). Everything else is pinned to the encoding the
  * oracles were validated against (TESTDATA.md, re-probed 2026-08-13).
  */
object Contract {

  private val tsLike = Set("timestamp", "timestamp_ntz", "bigint")

  /** table -> (column -> accepted Spark `simpleString` type names). */
  val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> tsLike, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> tsLike),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> tsLike,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** The embedding dimensionality every LSH/IVF plane generator AND the
    * static oracle SQL encode. A regenerated corpus with a different dim
    * would not fail any schema check (parquet footers carry no list
    * length) — it would be silently WRONG: plane dot products would fold
    * over the shorter of the two lengths. So the probe pays one extra
    * 1-row read to pin it. */
  val EmbeddingDim = 64

  /** Footer-only schema diff of every expected table under `dir` (plus the
    * single-row [[EmbeddingDim]] check — the one drift a footer cannot
    * see). Returns one line per drift; empty = contract holds. */
  def probe(spark: SparkSession, dir: String): Seq[String] = {
    // same legacy conf as Tables.events, so a nanos-encoded ts surfaces as
    // bigint (accepted) instead of failing the footer read itself
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dimDrift = Try {
      import org.apache.spark.sql.functions.size
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(size(org.apache.spark.sql.functions.col("embedding")))
        .limit(1).collect().headOption.map(_.getInt(0))
    }.toOption.flatten match {
      case Some(d) if d != EmbeddingDim =>
        Seq(s"embeddings.embedding: expected $EmbeddingDim elements, got $d")
      case _ => Nil // missing/unreadable table is reported by the loop below
    }
    dimDrift ++ expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      Try(spark.read.parquet(s"$dir/$table.parquet").schema) match {
        case Failure(e) =>
          Seq(s"$table: unreadable (${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString})")
        case Success(schema) =>
          val actual = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
          cols.flatMap { case (name, accepted) =>
            actual.get(name) match {
              case None => Seq(s"$table.$name: expected ${accepted.mkString("|")}, column MISSING")
              case Some(t) if !accepted(t) =>
                Seq(s"$table.$name: expected ${accepted.mkString("|")}, got $t")
              case _ => Nil
            }
          }
      }
    }
  }
}
