package graft.wheel

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.wheel.WheelAggregators.{TopKSummary, TopTalkers}

/** Temporal heavy hitters: the per-slot candidate summaries must (a) be
  * order-free under any partitioning of the build (exact until the
  * deterministic freeze-time compaction), (b) carry SOUND bounds — every
  * key's true count in a range lies in [lower, lower + slack] no matter
  * how slots compacted — and (c) CERTIFY exact top-k (keys and counts)
  * exactly when slack is zero. */
class TopTalkersSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
    val res = SCTest.check(params, prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val t0 = 1715299200L

  private def feed(agg: TopTalkers, rows: Seq[(Long, Long)]): TypedHawWheel[TopKSummary, TopKSummary] = {
    val tw = new TypedRwWheel(agg)
    rows.foreach { case (sec, k) => tw.mergeLift(sec, k) }
    tw.freeze()
  }

  private def bruteTopK(rows: Seq[(Long, Long)], s: Long, e: Long, k: Int): Seq[(Long, Long)] = {
    val counts = rows.filter(r => r._1 >= s && r._1 < e)
      .groupBy(_._2).view.mapValues(_.size.toLong).toSeq
    counts.sortBy { case (key, c) => (-c, key) }.take(k)
  }

  // sparse corpus: ≤ 3 distinct keys per second, cap 8 — never compacts
  private val genSparse: Gen[List[(Long, Long)]] = Gen.listOf(for {
    sec <- Gen.chooseNum(0L, 200L)
    key <- Gen.chooseNum(0L, 2L)
  } yield (t0 + sec, sec % 50 * 3 + key)) // ≤3 keys per sec, 150 keys total

  // dense corpus: many distinct keys per second with skewed heavy keys
  private val genDense: Gen[List[(Long, Long)]] = Gen.listOf(for {
    sec <- Gen.chooseNum(0L, 20L)
    key <- Gen.frequency((5, Gen.chooseNum(0L, 2L)), (2, Gen.chooseNum(3L, 200L)))
  } yield (t0 + sec, key))

  private val genRange: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(t0 - 10L, t0 + 210L)
    len <- Gen.chooseNum(0L, 220L)
  } yield (s, s + len)

  test("sparse slots: certified topK equals brute force on any range") {
    val agg = new TopTalkers(cap = 8)
    check(Prop.forAll(genSparse, genRange, Gen.chooseNum(1, 10)) { (rows, r, k) =>
      val hw = feed(agg, rows)
      val got = agg.topK(hw.combineRangeSlots(r._1, r._2), k)
      got.contains(bruteTopK(rows, r._1, r._2, k)) ||
        // an empty wheel still certifies the empty answer
        (rows.isEmpty && got.contains(Seq.empty))
    })
  }

  test("coarse-first descend read ≡ per-second fold, wide spans, any density") {
    // rows spread over ~3 days so the greedy decomposition actually uses
    // minute/hour/day rollup slots; mixed density so some coarse slots
    // carry slack (cap 4) and force descent while others serve exact
    val genWide: Gen[List[(Long, Long)]] = Gen.listOf(for {
      sec <- Gen.oneOf(Gen.chooseNum(0L, 260000L),            // sparse spread
        Gen.chooseNum(7200L, 7260L), Gen.chooseNum(90000L, 90060L)) // dense pockets
      key <- Gen.frequency((3, Gen.chooseNum(0L, 2L)), (2, Gen.chooseNum(3L, 40L)))
    } yield (t0 + sec, key))
    val genWideRange: Gen[(Long, Long)] = for {
      s <- Gen.chooseNum(t0 - 100L, t0 + 261000L)
      len <- Gen.chooseNum(0L, 262000L)
    } yield (s, s + len)
    val agg = new TopTalkers(cap = 4)
    check(Prop.forAll(genWide, genWideRange) { (rows, r) =>
      val hw = feed(agg, rows)
      val fine = hw.combineRangeSlots(r._1, r._2)
      val descend = hw.combineRangeDescend(r._1, r._2)(_.slack == 0L)
      descend == fine
    })
    // the budget-bounded variant: a tiny acc budget must abort to None,
    // a generous one must return exactly the fold
    check(Prop.forAll(genWide, genWideRange) { (rows, r) =>
      val hw = feed(agg, rows)
      val fine = hw.combineRangeSlots(r._1, r._2)
      val generous = hw.combineRangeDescendBounded(r._1, r._2)(_.slack == 0L)(
        _.keys.length <= 1000000)
      val tiny = hw.combineRangeDescendBounded(r._1, r._2)(_.slack == 0L)(
        _.keys.length <= 1)
      generous.contains(fine) &&
        // candidate sets only grow during the fold, so the tiny budget
        // aborts exactly when the final set exceeds it
        (if (fine.keys.length <= 1) tiny.contains(fine) else tiny.isEmpty)
    })
  }

  test("dense slots: bounds are sound for EVERY key after compaction") {
    val agg = new TopTalkers(cap = 4) // tiny cap: compaction engages hard
    check(Prop.forAll(genDense, genRange) { (rows, r) =>
      val hw = feed(agg, rows)
      val p = hw.combineRangeSlots(r._1, r._2)
      val truth = rows.filter(x => x._1 >= r._1 && x._1 < r._2)
        .groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val allKeys = truth.keySet ++ p.keys
      allKeys.forall { k =>
        val t = truth.getOrElse(k, 0L)
        val lo = p.lowerOf(k)
        lo <= t && t <= lo + p.slack
      }
    })
  }

  test("dense slots: a certified answer is always exactly the brute force") {
    val agg = new TopTalkers(cap = 4)
    check(Prop.forAll(genDense, genRange, Gen.chooseNum(1, 5)) { (rows, r, k) =>
      val hw = feed(agg, rows)
      agg.topK(hw.combineRangeSlots(r._1, r._2), k) match {
        case Some(ans) => ans == bruteTopK(rows, r._1, r._2, k)
        case None      => true // uncertified is allowed to bail
      }
    })
  }

  test("build is partition-count-independent (order-free until freeze)") {
    val agg = new TopTalkers(cap = 4)
    check(Prop.forAll(genDense, Gen.chooseNum(1, 5)) { (rows, parts) =>
      val whole = feed(agg, rows)
      val split = rows.zipWithIndex.groupBy(_._2 % parts).values
        .map(chunk => { val tw = new TypedRwWheel(agg)
          chunk.foreach { case ((sec, k), _) => tw.mergeLift(sec, k) }; tw })
      val merged = split.reduceOption((a, b) => a.merge(b))
        .getOrElse(new TypedRwWheel(agg)).freeze()
      val r = (t0 - 5, t0 + 30L)
      whole.combineRangeSlots(r._1, r._2) == merged.combineRangeSlots(r._1, r._2)
    })
  }

  test("summary serde round-trips (Java compact + Kryo)") {
    val agg = new TopTalkers(cap = 4)
    val tw = new TypedRwWheel(agg)
    (0 until 3000).foreach { i => tw.mergeLift(t0 + i % 20, (i % 37).toLong) }
    def roundTripJava[T <: AnyRef](t: T): T = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.ObjectOutputStream(bos); o.writeObject(t); o.close()
      new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[T]
    }
    val kryo = new org.apache.spark.serializer.KryoSerializer(
      new org.apache.spark.SparkConf(false)).newInstance()
    val viaJava = roundTripJava(tw).freeze()
    val viaKryo = kryo.deserialize[TypedRwWheel[Long, TopKSummary, TopKSummary]](
      kryo.serialize(tw)).freeze()
    val direct = tw.freeze()
    val r = (t0, t0 + 20L)
    assert(viaJava.combineRangeSlots(r._1, r._2) == direct.combineRangeSlots(r._1, r._2))
    assert(viaKryo.combineRangeSlots(r._1, r._2) == direct.combineRangeSlots(r._1, r._2))
  }

  test("compact keeps top-cap by (count desc, key asc) and widens slack soundly") {
    val agg = new TopTalkers(cap = 2)
    val p = TopKSummary(Array(1L, 2L, 3L, 4L), Array(5L, 9L, 2L, 9L), 1L)
    val c = agg.compact(p)
    // kept: keys 2 and 4 (count 9 each); largest dropped count = 5 (key 1)
    assert(c.keys.toSeq == Seq(2L, 4L) && c.lowers.toSeq == Seq(9L, 9L))
    assert(c.slack == 1L + 5L)
    assert(agg.compact(c) eq c) // at or under cap: untouched
  }

  test("topK/topKBounds selection ≡ full (count desc, key asc) sort, any k") {
    // pins the bounded-insertion selection (and its k-large sort fallback)
    // against the reference ranking it replaced, incl. tie-heavy counts
    val genSummary = for {
      n <- Gen.chooseNum(0, 60)
      keys <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L)).map(_.distinct)
      lowers <- Gen.listOfN(keys.length, Gen.chooseNum(0L, 5L)) // dense ties
      slack <- Gen.oneOf(0L, 3L)
    } yield TopKSummary(keys.sorted.toArray, lowers.toArray, slack)
    val agg = new TopTalkers(cap = 1024)
    val prop = Prop.forAll(genSummary, Gen.chooseNum(0, 70)) { (p, k) =>
      val ref = p.keys.indices.sortBy(i => (-p.lowers(i), p.keys(i))).take(k)
        .map(i => (p.keys(i), p.lowers(i)))
      val bounds = agg.topKBounds(p, k).map(t => (t._1, t._2))
      val exact = agg.topK(p, k)
      bounds == ref &&
        (if (p.slack == 0L) exact.contains(ref) else exact.isEmpty) &&
        agg.topKBounds(p, k).forall(t => t._3 == t._2 + p.slack)
    }
    check(prop)
  }
}
