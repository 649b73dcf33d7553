package graft.wheel

import org.scalatest.funsuite.AnyFunSuite

class LongLongSumMapSpec extends AnyFunSuite {

  test("sum semantics match a reference map across growth, key 0, negatives") {
    val rnd = new scala.util.Random(0x12L)
    val m = new LongLongSumMap(16)
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    // keyspace small enough to force many collisions + repeated adds;
    // include 0 and negative keys explicitly
    val keyPool = Array(0L, -1L, Long.MinValue + 7, Long.MaxValue - 3) ++
      Array.fill(200)(rnd.nextLong() % 1000)
    (1 to 20000).foreach { _ =>
      val k = keyPool(rnd.nextInt(keyPool.length))
      val v = 1L + rnd.nextInt(100)
      m.add(k, v)
      ref(k) = ref.getOrElse(k, 0L) + v
    }
    assert(m.size === ref.size)
    val (ks, ls) = m.toSortedArrays
    assert(ks.toSeq === ref.keys.toSeq.sorted)
    ks.zip(ls).foreach { case (k, v) => assert(v === ref(k), s"key $k") }
  }

  test("clear() resets for reuse without leaking prior keys") {
    val m = new LongLongSumMap(16)
    (0 until 5000).foreach(i => m.add(i.toLong, 1L))
    m.clear()
    assert(m.size === 0)
    m.add(0L, 7L); m.add(42L, 3L); m.add(42L, 4L)
    assert(m.size === 2)
    val (ks, ls) = m.toSortedArrays
    assert(ks.toSeq === Seq(0L, 42L))
    assert(ls.toSeq === Seq(7L, 7L))
  }

  test("large uniform keyset: every key present exactly once after growth") {
    val m = new LongLongSumMap()
    val n = 300000
    (0 until n).foreach(i => m.add(i.toLong * 2654435761L, i + 1L))
    assert(m.size === n)
    val (ks, ls) = m.toSortedArrays
    assert(ks.length === n)
    // sorted ascending and strictly unique
    (1 until n).foreach(i => assert(ks(i - 1) < ks(i)))
    assert(ls.sum === (1L to n.toLong).sum)
  }
}
