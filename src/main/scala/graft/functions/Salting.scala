package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utility for hot-key equi-joins: when one join key
  * carries a disproportionate share of the big side (a celebrity user, a
  * default value), a plain shuffle join lands the whole key on one task.
  * Salting spreads the big side's rows for each key across `salts`
  * buckets and replicates the small side once per bucket — the classic
  * manual fix when AQE's skew-join splitting can't apply (e.g. the skewed
  * side feeds an aggregation, or stats are missing).
  *
  * Result-identical to `big.join(small, key)` for inner joins: every big
  * row still meets every matching small row exactly once.
  */
object Salting {
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
