package graft.wheel

/** Open-addressing long→long SUM map for the heavy-hitter read path
  * ([[graft.index.TopKIndexedWheel]].read): accumulates `add(key, count)`
  * over visited slot summaries without the boxing garbage of
  * `java.util.HashMap[Long, Long]` — at ~10⁵ distinct keys per wide-range
  * read the boxed map's node+box churn was the read's latency tail
  * (observed 21 ms max vs ~1 ms p99). Linear probing, power-of-two
  * capacity, grow at 5/8 load, no deletion (reads only accumulate).
  * Presence is tracked in a bitset so key 0 needs no sentinel. */
final class LongLongSumMap(initialCapacity: Int = 1 << 10) {
  private var mask = {
    var c = java.lang.Integer.highestOneBit(math.max(16, initialCapacity) - 1) << 1
    if (c <= 0) c = 16
    c - 1
  }
  private var keys = new Array[Long](mask + 1)
  private var vals = new Array[Long](mask + 1)
  private var occupied = new Array[Long]((mask + 1 + 63) >>> 6) // bitset
  private var n = 0

  def size: Int = n

  /** Reset for reuse, keeping grown capacity: only the presence bitset
    * needs wiping (keys/vals are never read unoccupied). Lets a
    * thread-local instance amortize its arrays across reads instead of
    * allocating megabytes of garbage per read. */
  def clear(): Unit = {
    java.util.Arrays.fill(occupied, 0L)
    n = 0
  }

  @inline private def isOcc(i: Int): Boolean =
    (occupied(i >>> 6) & (1L << (i & 63))) != 0L
  @inline private def setOcc(i: Int): Unit =
    occupied(i >>> 6) |= 1L << (i & 63)

  /** SplitMix64 finalizer — sequential ids would otherwise cluster probes. */
  @inline private def mix(x0: Long): Int = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & mask).toInt
  }

  def add(key: Long, count: Long): Unit = {
    var i = mix(key)
    while (isOcc(i) && keys(i) != key) i = (i + 1) & mask
    if (isOcc(i)) vals(i) = Math.addExact(vals(i), count)
    else {
      setOcc(i); keys(i) = key; vals(i) = count; n += 1
      if (n.toLong * 8 > (mask + 1).toLong * 5) grow()
    }
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val oo = occupied; val on = mask + 1
    mask = (on << 1) - 1
    keys = new Array[Long](on << 1)
    vals = new Array[Long](on << 1)
    occupied = new Array[Long](((on << 1) + 63) >>> 6)
    var i = 0
    while (i < on) {
      if ((oo(i >>> 6) & (1L << (i & 63))) != 0L) {
        var j = mix(ok(i))
        while (isOcc(j)) j = (j + 1) & mask
        setOcc(j); keys(j) = ok(i); vals(j) = ov(i)
      }
      i += 1
    }
  }

  /** (sorted keys, aligned values) — the [[WheelAggregators.TopKSummary]]
    * array layout. One bitset-word sweep + an in-place dual-array quicksort
    * (re-probing per sorted key costs a cache-missing probe chain each —
    * measured ~2× the whole read at 10⁵ keys). The sweep walks occupied
    * WORDS and jumps to set bits, so a presized-but-sparse table (the
    * reused thread-local read map: capacity 2^17, often ~10³ live keys)
    * costs O(words + n), not O(capacity) — the full-table scan was ~2/3 of
    * a small read's latency. */
  def toSortedArrays: (Array[Long], Array[Long]) = {
    val ks = new Array[Long](n)
    val ls = new Array[Long](n)
    var i = 0; var w = 0
    while (w < occupied.length) {
      var bits = occupied(w)
      while (bits != 0L) {
        val o = (w << 6) + java.lang.Long.numberOfTrailingZeros(bits)
        ks(i) = keys(o); ls(i) = vals(o); i += 1
        bits &= bits - 1
      }
      w += 1
    }
    LongLongSumMap.sortPairs(ks, ls, 0, n - 1)
    (ks, ls)
  }
}

object LongLongSumMap {
  /** In-place quicksort of `ks[lo..hi]` with `ls` permuted alongside —
    * median-of-three pivot, insertion sort below 16, recursion on the
    * smaller side (stack depth O(log n)). Keys are unique (map output). */
  private[wheel] def sortPairs(ks: Array[Long], ls: Array[Long], lo0: Int, hi0: Int): Unit = {
    var lo = lo0; var hi = hi0
    while (hi - lo > 15) {
      val mid = lo + ((hi - lo) >>> 1)
      // median-of-three to the middle
      if (ks(mid) < ks(lo)) { swap(ks, ls, mid, lo) }
      if (ks(hi) < ks(lo)) { swap(ks, ls, hi, lo) }
      if (ks(hi) < ks(mid)) { swap(ks, ls, hi, mid) }
      val pivot = ks(mid)
      var i = lo; var j = hi
      while (i <= j) {
        while (ks(i) < pivot) i += 1
        while (ks(j) > pivot) j -= 1
        if (i <= j) { swap(ks, ls, i, j); i += 1; j -= 1 }
      }
      if (j - lo < hi - i) { sortPairs(ks, ls, lo, j); lo = i }
      else { sortPairs(ks, ls, i, hi); hi = j }
    }
    // insertion sort for the short tail
    var i = lo + 1
    while (i <= hi) {
      val k = ks(i); val v = ls(i)
      var j = i - 1
      while (j >= lo && ks(j) > k) { ks(j + 1) = ks(j); ls(j + 1) = ls(j); j -= 1 }
      ks(j + 1) = k; ls(j + 1) = v
      i += 1
    }
  }

  @inline private def swap(ks: Array[Long], ls: Array[Long], a: Int, b: Int): Unit = {
    val tk = ks(a); ks(a) = ks(b); ks(b) = tk
    val tv = ls(a); ls(a) = ls(b); ls(b) = tv
  }
}
