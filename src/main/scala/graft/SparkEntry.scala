package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops.{DocAnalytics, ParkingAnalytics}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParkingAnalytics.hourlyStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * LLM-pipeline surface (dedup / similarity / text analysis). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParkingAnalytics.queries ++ DocAnalytics.queries ++
      graft.ops.RelAnalytics.queries ++
      Map("p24_hourly_doc_flat" -> (graft.ops.HourlyDocs.flat _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    OracleSql.parking ++ OracleSqlDocs.docs ++ OracleSqlRel.rel
}
