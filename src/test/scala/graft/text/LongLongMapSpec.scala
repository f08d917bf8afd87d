package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Model-checks the primitive union-find map against mutable.HashMap and
  * pins the edge cases the open-addressing layout could get wrong: the
  * Long.MinValue sentinel as a REAL key, resize across the load-factor
  * boundary, and colliding probe chains. */
class LongLongMapSpec extends AnyFunSuite {

  test("random ops agree with mutable.HashMap (incl. resizes)") {
    val rnd = new scala.util.Random(42)
    val m = new LongLongMap(16)
    val ref = scala.collection.mutable.HashMap.empty[Long, Long]
    // small key space forces overwrites; 200k ops forces several resizes
    for (_ <- 1 to 200000) {
      val k = rnd.nextInt(50000).toLong - 25000
      rnd.nextInt(3) match {
        case 0 =>
          val v = rnd.nextLong()
          m(k) = v; ref(k) = v
        case 1 =>
          assert(m.getOrElse(k, -1L) === ref.getOrElse(k, -1L))
        case 2 =>
          val v = rnd.nextLong()
          assert(m.getOrElseUpdate(k, v) === ref.getOrElseUpdate(k, v))
      }
    }
    assert(m.size === ref.size)
    assert(m.keysIterator.toSet === ref.keySet)
  }

  test("sentinel and extreme keys round-trip") {
    val m = new LongLongMap(16)
    val keys = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L, Long.MaxValue)
    keys.zipWithIndex.foreach { case (k, i) => m(k) = i.toLong }
    keys.zipWithIndex.foreach { case (k, i) =>
      assert(m.getOrElse(k, -99L) === i.toLong, s"key $k")
    }
    assert(m.size === keys.size)
    assert(m.keysIterator.toSet === keys.toSet)
    // getOrElseUpdate must NOT overwrite present keys, sentinel included
    keys.foreach(k => m.getOrElseUpdate(k, 777L))
    keys.zipWithIndex.foreach { case (k, i) => assert(m.getOrElse(k, -99L) === i.toLong) }
    // absent lookups fall through to the default
    assert(m.getOrElse(123456789L, -7L) === -7L)
  }

  test("sequential ids (the doc-id shape) survive growth with full fidelity") {
    val m = new LongLongMap(16)
    val n = 100000
    for (i <- 0L until n) m(i) = i * 31
    assert(m.size === n)
    for (i <- 0L until n) assert(m.getOrElse(i, -1L) === i * 31)
    assert(m.keysIterator.size === n)
  }
}
