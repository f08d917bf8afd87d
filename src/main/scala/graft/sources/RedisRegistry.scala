package graft.sources

import java.net.Socket

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sinks.Resp

/** Redis KV read-back loader — the reference's `UserService.getAllUsers`
  * scan path (apps/repo-account/src/main/scala/repo_account/domain/
  * service/UserService.scala:45-52: `keys user:*` → per-key GET →
  * permissive JSON parse, corrupt/empty values silently skipped)
  * re-expressed over the engine's zero-dependency RESP framing
  * ([[graft.sinks.Resp]] — the sandbox has no client library; the
  * reference used jedis).
  *
  * Two deliberate upgrades over the reference's wire usage, same
  * results: cursored `SCAN MATCH prefix*` instead of the blocking
  * `KEYS` (KEYS stalls a production Redis for the full keyspace walk),
  * and chunked `MGET` instead of one GET round-trip per key.
  *
  * Scale shape: the key enumeration and value fetch are DRIVER-side by
  * design — this is the reference's own access pattern for a
  * dimension-sized registry (every user fits in one Redis instance, so
  * by construction the values fit in one driver), and chunking bounds
  * each round-trip. The PARSE is distributed: raw values become a
  * one-column DataFrame and `from_json` + validity filters run as a
  * plan, so a registry at the large end costs the driver only raw
  * strings, never parsed object graphs. Callers with a truly large
  * keyspace shard by prefix and union the loads.
  */
object RedisRegistry {

  /** The engine's UserModel surface (reference UserModel.scala:6-14
    * trimmed to the dimension fields the analytics consume). */
  val userSchema: StructType = StructType(Seq(
    StructField("u_plate", StringType),
    StructField("username", StringType),
    StructField("email", StringType),
    StructField("handicapped", BooleanType)))

  /** `keyPrefix` escaped for use inside a SCAN MATCH glob: Redis glob
    * metacharacters (`*`, `?`, `[`, and the escape `\` itself) are
    * backslash-prefixed so the prefix always matches LITERALLY — a key
    * prefix like `user[1]:` must not be read as a character class. */
  private[sources] def globEscape(keyPrefix: String): String =
    keyPrefix.flatMap {
      case c @ ('\\' | '*' | '?' | '[') => s"\\$c"
      case c => c.toString
    }

  /** Raw (key, value) pairs for every present key matching `keyPrefix*`
    * (the prefix is glob-escaped, so it matches literally), via SCAN +
    * chunked MGET on one synchronous connection. Keys SCAN
    * returned that vanish before their MGET (expired temporaries — the
    * reference's setex users) come back nil and are dropped, exactly the
    * `Option(jedis.get(key)).flatMap(...)` null-skip. */
  def scanValues(host: String, port: Int, keyPrefix: String,
                 scanCount: Int = 512): Seq[(String, String)] = {
    val socket = new Socket(host, port)
    try {
      val out = socket.getOutputStream
      val in = socket.getInputStream
      def command(args: String*): Resp.Reply = {
        out.write(Resp.encode(args))
        out.flush()
        Resp.readReply(in) match {
          case Resp.Err(m) => throw new RuntimeException(s"redis error reply: $m")
          case r => r
        }
      }
      // cursored keyspace walk; SCAN may repeat keys across rescans, so
      // dedup while preserving first-seen order
      val keys = collection.mutable.LinkedHashSet.empty[String]
      var cursor = "0"
      var first = true
      while (first || cursor != "0") {
        first = false
        command("SCAN", cursor, "MATCH", s"${globEscape(keyPrefix)}*",
            "COUNT", scanCount.toString) match {
          case Resp.Arr(Seq(Resp.Bulk(Some(next)), Resp.Arr(page))) =>
            cursor = next
            page.foreach {
              case Resp.Bulk(Some(k)) => keys += k
              case other => throw new RuntimeException(s"unexpected SCAN key: $other")
            }
          case other => throw new RuntimeException(s"unexpected SCAN reply: $other")
        }
      }
      keys.toSeq.grouped(math.max(1, scanCount)).flatMap { chunk =>
        command(("MGET" +: chunk): _*) match {
          case Resp.Arr(vals) =>
            chunk.zip(vals).collect { case (k, Resp.Bulk(Some(v))) => k -> v }
          case other => throw new RuntimeException(s"unexpected MGET reply: $other")
        }
      }.toSeq
    } finally socket.close()
  }

  /** All users currently in the registry, as a DataFrame — the
    * `getAllUsers` twin. Values that are empty, unparseable JSON, or
    * missing a required field are skipped (the reference's
    * `safeParseJson` returns None for all three), which the plan
    * expresses as `from_json` nulling the struct / its fields and a
    * validity filter. Pass a custom `schema` to read registries with
    * extra fields; `required` names the fields a row must carry
    * (default: all of them, circe's semantics for a case class with no
    * defaults on those fields). */
  def loadUsers(spark: SparkSession, host: String, port: Int = 6379,
                keyPrefix: String = "user:",
                schema: StructType = userSchema,
                required: Seq[String] = Seq.empty): DataFrame =
    parseUsers(spark, scanValues(host, port, keyPrefix).map(_._2),
      schema, required)

  /** The sharded-by-prefix escape hatch [[loadUsers]]'s charter promises
    * callers with a keyspace too large for one sequential SCAN: each
    * shard walks `keyPrefix + suffix` on its OWN connection, the walks
    * run concurrently (bounded thread pool), and the raw values union
    * before the same distributed parse. The suffixes must PARTITION the
    * keyspace under `keyPrefix` — non-overlapping (no suffix a prefix of
    * another) and covering — for the result to equal the unsharded load;
    * e.g. a hex-bucketed key scheme shards on "0".."f". Suffixes are
    * glob-escaped like the prefix itself. */
  def loadUsersSharded(spark: SparkSession, host: String, port: Int = 6379,
                       keyPrefix: String = "user:",
                       shardSuffixes: Seq[String] = (0 to 9).map(_.toString),
                       schema: StructType = userSchema,
                       required: Seq[String] = Seq.empty,
                       maxParallel: Int = 8): DataFrame = {
    require(shardSuffixes.nonEmpty, "need at least one shard suffix")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(shardSuffixes.size, maxParallel)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fs = shardSuffixes.map { sfx =>
        scala.concurrent.Future(scanValues(host, port, keyPrefix + sfx))
      }
      val raw = scala.concurrent.Await
        .result(scala.concurrent.Future.sequence(fs),
          scala.concurrent.duration.Duration(10, "min"))
        .flatten.map(_._2)
      parseUsers(spark, raw, schema, required)
    } finally pool.shutdown()
  }

  /** Raw JSON values → the permissive distributed parse shared by the
    * sharded and unsharded loaders (`from_json` + validity filters as a
    * plan — the driver only ever holds raw strings). */
  private def parseUsers(spark: SparkSession, raw: Seq[String],
                         schema: StructType,
                         required: Seq[String]): DataFrame = {
    import spark.implicits._
    val must = if (required.nonEmpty) required else schema.fieldNames.toSeq
    raw.toDF("__raw")
      .select(from_json(col("__raw"), schema).as("u"))
      .filter(col("u").isNotNull &&
        must.map(f => col(s"u.$f").isNotNull).reduce(_ && _))
      .select(schema.fieldNames.map(f => col(s"u.$f").as(f)).toSeq: _*)
  }
}
