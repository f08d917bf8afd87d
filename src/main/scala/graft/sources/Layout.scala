package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning: Z-ORDER the rows of a
  * table across two numeric dimensions before writing, so parquet
  * row-group/file min-max statistics become selective on BOTH columns at
  * once. A table sorted on one key prunes scans filtered on that key
  * only; interleaving the bits of two keys (the Z-curve) keeps rows close
  * in BOTH dimensions within each file, so a filter on either — or both —
  * skips most files by footer stats alone. At 100 TB this is the
  * difference between a point-ish query reading a few files and reading
  * the table; like bucketing it is a write-once layout decision, paid as
  * one range-shuffle at write time.
  *
  * The z-value interleaves the low `bits` of each dimension after min-max
  * normalization to [0, 2^bits): coarse on purpose — the curve only
  * steers LAYOUT, never query results, so quantization costs nothing in
  * correctness (LayoutSpec asserts round-trip equality and measures the
  * clustering win directly on the written files' per-file ranges). The
  * normalization ranges come from one tiny min/max aggregate; the
  * interleave itself is a row-local codegen'd fold — no UDF, no second
  * pass over the data beyond the range shuffle the layout requires.
  */
object Layout {

  /** Write `df` z-ordered on (`c1`, `c2`) into `numFiles` range-split
    * parquet files at `path`. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    numFiles: Int = 8, bits: Int = 16): Unit = {
    val r = df.agg(
      min(col(c1).cast("double")), max(col(c1).cast("double")),
      min(col(c2).cast("double")), max(col(c2).cast("double"))).head()
    def normExpr(c: String, lo: Double, hi: Double): Column = {
      val scale = if (hi > lo) ((1L << bits) - 1).toDouble / (hi - lo) else 0.0
      least(lit((1L << bits) - 1), greatest(lit(0L),
        ((col(c).cast("double") - lit(lo)) * lit(scale)).cast("long")))
    }
    df
      .withColumn("__zx", normExpr(c1, r.getDouble(0), r.getDouble(1)))
      .withColumn("__zy", normExpr(c2, r.getDouble(2), r.getDouble(3)))
      // acc | x_bit<<2i | y_bit<<2i+1, one fold over the bit positions
      .withColumn("__z", expr(
        s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) ->
           |  acc + shiftleft(shiftright(__zx, i) % 2, 2*i)
           |      + shiftleft(shiftright(__zy, i) % 2, 2*i + 1))""".stripMargin))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__zx", "__zy", "__z")
      .write.mode("overwrite").parquet(path)
  }
}
