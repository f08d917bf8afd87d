package graft.text

/** Primitive open-addressing long→long hash map (linear probing,
  * power-of-two capacity, 0.75 load factor) backing the single-task
  * union-find path in [[TextDedup.duplicateGroups]].
  *
  * Why not `mutable.HashMap[Long, Long]`: the boxed map costs ~50–80
  * bytes per entry (hash node + boxed key + boxed value), so the 10M-edge
  * localEdgeThreshold (≤ ~20M nodes) would need 1.5–2+ GB in one task —
  * far past the budget its comment promises. Two parallel long arrays
  * cost 16 bytes per SLOT: at 0.75 load the worst post-resize footprint
  * is ~21.4 bytes/entry, and 20M nodes fit in 2^25 slots = 512 MiB — a
  * real, bounded "few hundred MB" budget.
  *
  * Empty slots are marked by the key sentinel `Long.MinValue`; that key
  * itself is carried in two scalar side fields, so ARBITRARY keys are
  * handled. Hashing is the splitmix64 finalizer — sequential doc ids
  * (the common case) spread uniformly instead of clustering probes.
  * Single-threaded by design (one union-find task owns one map).
  */
private[graft] final class LongLongMap(initialCapacity: Int = 1 << 16) {
  private[this] final val Empty = Long.MinValue

  private[this] var keys = {
    var p = 16
    while (p < initialCapacity && p < (1 << 30)) p <<= 1
    val a = new Array[Long](p)
    java.util.Arrays.fill(a, Empty)
    a
  }
  private[this] var vals = new Array[Long](keys.length)
  private[this] var mask = keys.length - 1
  private[this] var n = 0 // entries in the arrays (excludes the sentinel key)
  private[this] var hasSentinelKey = false
  private[this] var sentinelVal = 0L

  def size: Int = n + (if (hasSentinelKey) 1 else 0)

  private[this] def slot(k: Long): Int = {
    var h = k
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h.toInt & mask
  }

  /** Value at `k`, or `default` if absent (union-find reads absent as
    * self-root, so `getOrElse(k, k)` is the natural find step). */
  def getOrElse(k: Long, default: Long): Long = {
    if (k == Empty) return if (hasSentinelKey) sentinelVal else default
    var i = slot(k)
    while (keys(i) != Empty) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    default
  }

  def update(k: Long, v: Long): Unit = {
    if (k == Empty) { hasSentinelKey = true; sentinelVal = v; return }
    var i = slot(k)
    while (keys(i) != Empty) {
      if (keys(i) == k) { vals(i) = v; return }
      i = (i + 1) & mask
    }
    keys(i) = k; vals(i) = v; n += 1
    if ((n.toLong << 2) >= 3L * keys.length) grow()
  }

  /** Insert `k → v` only if `k` is absent; returns the bound value. */
  def getOrElseUpdate(k: Long, v: Long): Long = {
    if (k == Empty) {
      if (!hasSentinelKey) { hasSentinelKey = true; sentinelVal = v }
      return sentinelVal
    }
    var i = slot(k)
    while (keys(i) != Empty) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    keys(i) = k; vals(i) = v; n += 1
    if ((n.toLong << 2) >= 3L * keys.length) grow()
    v
  }

  private[this] def grow(): Unit = {
    val ok = keys; val ov = vals
    keys = new Array[Long](ok.length << 1)
    java.util.Arrays.fill(keys, Empty)
    vals = new Array[Long](keys.length)
    mask = keys.length - 1
    var i = 0
    while (i < ok.length) {
      if (ok(i) != Empty) {
        var j = slot(ok(i))
        while (keys(j) != Empty) j = (j + 1) & mask
        keys(j) = ok(i); vals(j) = ov(i)
      }
      i += 1
    }
  }

  /** All keys, in internal order. Inserting during iteration is NOT
    * supported (a resize would move slots); value updates are fine —
    * exactly the union-find emission pattern (find() compresses paths
    * but every node was inserted up front). */
  def keysIterator: Iterator[Long] = {
    val arr = keys // pin the array: a (disallowed) resize would not corrupt a live iterator
    val main = Iterator.range(0, arr.length).map(arr).filter(_ != Empty)
    if (hasSentinelKey) main ++ Iterator.single(Empty) else main
  }
}
