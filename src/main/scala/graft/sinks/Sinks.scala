package graft.sinks

import java.io.OutputStream
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.concurrent.TrieMap

/** Result-delivery sinks (SURVEY.md §2.1 S9/S10): keyed JSON documents and
  * time-series points, exactly the two Redis write shapes the reference
  * uses (JSON.SET, MainHourly.scala:173-188; TS.CREATE/TS.ADD,
  * MainDaily.scala:264-283, MainWeekly.scala:257-265).
  *
  * Both traits are idempotent-by-key: a `foreachBatch` replay after a
  * failure re-puts the same (window-derived) key with the same value, so
  * at-least-once delivery converges — the same property the reference
  * relies on when the "@every 1m" hourly job re-JSON.SETs its hour key.
  *
  * Implementations must be driver-constructible and either serializable or
  * used via `collect`-free `foreachPartition` closures that construct the
  * connection executor-side.
  */
trait KeyValueSink extends Serializable {
  def put(key: String, json: String): Unit
}

trait TimeSeriesSink extends Serializable {
  def add(series: String, timestampMillis: Long, value: Double): Unit
}

/** Test/sandbox sink: thread-safe in-memory maps. The store lives in a
  * JVM-global registry keyed by sink id — Spark serializes closures even in
  * local mode, so the executor-side deserialized copy must reach the same
  * store the driver instance reads (same trick as Spark's memory sink). */
object InMemoryKeyValueSink {
  private[sinks] val stores = TrieMap.empty[String, TrieMap[String, String]]
}
final class InMemoryKeyValueSink extends KeyValueSink {
  private val id = java.util.UUID.randomUUID().toString
  def store: TrieMap[String, String] =
    InMemoryKeyValueSink.stores.getOrElseUpdate(id, TrieMap.empty)
  def put(key: String, json: String): Unit = store.put(key, json)
}

object InMemoryTimeSeriesSink {
  private[sinks] val stores = TrieMap.empty[String, TrieMap[String, Vector[(Long, Double)]]]
}
final class InMemoryTimeSeriesSink extends TimeSeriesSink {
  private val id = java.util.UUID.randomUUID().toString
  def store: TrieMap[String, Vector[(Long, Double)]] =
    InMemoryTimeSeriesSink.stores.getOrElseUpdate(id, TrieMap.empty)
  def add(series: String, ts: Long, value: Double): Unit =
    store.updateWith(series) {
      case Some(v) => Some((v :+ (ts -> value)).sortBy(_._1))
      case None    => Some(Vector(ts -> value))
    }
}

/** File-backed sink for environments without Redis: one file per key under
  * `dir` (key sanitized), contents = the JSON document. Idempotent by
  * construction (overwrite). */
final class FileKeyValueSink(dir: String) extends KeyValueSink {
  Files.createDirectories(Paths.get(dir))
  def put(key: String, json: String): Unit =
    Files.write(Paths.get(dir, key.replaceAll("[^A-Za-z0-9:._-]", "_")),
      json.getBytes(StandardCharsets.UTF_8))
}

/** File-backed TS sink: append-only `series.ts` files of "ts value" lines. */
final class FileTimeSeriesSink(dir: String) extends TimeSeriesSink {
  Files.createDirectories(Paths.get(dir))
  def add(series: String, ts: Long, value: Double): Unit =
    Files.write(
      Paths.get(dir, series.replaceAll("[^A-Za-z0-9:._-]", "_") + ".ts"),
      s"$ts $value\n".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
}

/** Minimal RESP (REdis Serialization Protocol) encoder — the wire format of
  * every Redis command — so the Redis sinks need no client library at all
  * (the sandbox has none; the reference used jedis). RESP frames a command
  * as an array of bulk strings:
  * `*<n>\r\n` then per arg `$<len>\r\n<bytes>\r\n`.
  */
object Resp {
  def encode(args: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"*${args.length}\r\n".getBytes(StandardCharsets.UTF_8))
    args.foreach { a =>
      val b = a.getBytes(StandardCharsets.UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(StandardCharsets.UTF_8))
      out.write(b)
      out.write("\r\n".getBytes(StandardCharsets.UTF_8))
    }
    out.toByteArray
  }

  def jsonSet(key: String, json: String): Seq[String] = Seq("JSON.SET", key, ".", json)
  def tsAdd(series: String, ts: Long, value: Double): Seq[String] =
    Seq("TS.ADD", series, ts.toString, value.toString)
  def tsCreate(series: String): Seq[String] = Seq("TS.CREATE", series, "RETENTION", "0")
}

/** Redis JSON.SET sink over a raw socket (reference MainHourly.scala:
  * 173-188 semantics). Executor-side: one connection per partition via
  * `foreachPartition`; replies are drained but only checked for RESP
  * errors. Untested in the sandbox (no Redis) — the encoder and key/value
  * shaping are covered by the file/in-memory twins. */
final class RedisKeyValueSink(host: String, port: Int = 6379) extends KeyValueSink {
  @transient private var socket: Socket = _
  @transient private var out: OutputStream = _
  private def ensure(): Unit = if (socket == null || socket.isClosed) {
    socket = new Socket(host, port)
    out = socket.getOutputStream
  }
  def put(key: String, json: String): Unit = synchronized {
    ensure()
    out.write(Resp.encode(Resp.jsonSet(key, json)))
    out.flush()
    val first = socket.getInputStream.read()
    if (first == '-') throw new RuntimeException(s"redis error reply for $key")
    while (socket.getInputStream.available() > 0) socket.getInputStream.read()
  }
}
