package graft.wheel

import org.scalatest.funsuite.AnyFunSuite

/** The ingest wheels' compact Java serialization (custom
  * writeObject/readObject writing raw primitive slot runs — one object per
  * WHEEL, not one per slot) must round-trip to an equivalent wheel: the
  * distributed build ships these through Spark's closure/treeAggregate
  * serializer, so a lossy round-trip silently corrupts every index built
  * from more than one partition. */
class WheelSerdeSpec extends AnyFunSuite {

  private def roundTrip[T <: AnyRef](t: T): T = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(t); oos.close()
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    ois.readObject().asInstanceOf[T]
  }

  /** Kryo round-trip through Spark's OWN KryoSerializer (the exact path a
    * session with spark.serializer=KryoSerializer ships shuffle records
    * through) — the wheels' @transient slots + Java-only hooks would
    * silently deserialize EMPTY under Kryo's FieldSerializer, so both
    * classes implement KryoSerializable (round-10 review finding). */
  private def kryoTrip[T <: AnyRef: scala.reflect.ClassTag](t: T): T = {
    val conf = new org.apache.spark.SparkConf(false)
    val ser = new org.apache.spark.serializer.KryoSerializer(conf).newInstance()
    ser.deserialize[T](ser.serialize(t))
  }

  private val t0 = 1715299200L

  test("RwWheel round-trips: frozen wheel equal before and after") {
    val rw = new RwWheel(scale = 2, hasValues = true)
    (0 until 5000).map(i => (t0 + (i * 37) % 10000, (i % 997) / 100.0))
      .sortBy(_._1).foreach { case (sec, v) =>
        rw.advanceTo(sec * 1000L); rw.insert(sec * 1000L, v)
      }
    val back = roundTrip(rw)
    val a = rw.freeze()
    val b = back.freeze()
    assert(a.range(t0 - 10, t0 + 20000) == b.range(t0 - 10, t0 + 20000))
    assert(a.groupBy(t0, t0 + 10000, 1) == b.groupBy(t0, t0 + 10000, 1))
    assert(back.watermark == rw.watermark)
  }

  test("RwWheel round-trips with no values (count-only)") {
    val rw = new RwWheel(scale = 0, hasValues = false)
    (0 until 100).foreach { i =>
      rw.advanceTo((t0 + i) * 1000L); rw.insert((t0 + i) * 1000L, 0.0)
    }
    val back = roundTrip(rw)
    assert(back.freeze().range(t0, t0 + 100) == rw.freeze().range(t0, t0 + 100))
  }

  test("deserialized RwWheel accepts further ingest and merges") {
    val rw = new RwWheel(scale = 2, hasValues = true)
    rw.advanceTo(t0 * 1000L); rw.insert(t0 * 1000L, 1.25)
    val back = roundTrip(rw)
    back.insert((t0 + 5) * 1000L, 2.5)
    val ra = back.freeze().range(t0, t0 + 10)
    assert(ra.count == 2L && ra.minOpt.contains(1.25) && ra.maxOpt.contains(2.5))
  }

  test("TypedRwWheel round-trips through the compact byte-serde path (HLL)") {
    val agg = new WheelAggregators.HllDistinct(p = 9)
    assert(agg.partialSerde.isDefined) // the compact path, not the fallback
    val tw = new TypedRwWheel(agg)
    (0 until 20000).foreach { i => tw.mergeLift(t0 + i % 777, (i % 4321).toLong) }
    val back = roundTrip(tw)
    val a = tw.freeze(); val b = back.freeze()
    assert(a.range(t0, t0 + 1000) == b.range(t0, t0 + 1000))
    (0 until 13).foreach { k =>
      assert(a.range(t0 + k * 60, t0 + (k + 1) * 60) ==
        b.range(t0 + k * 60, t0 + (k + 1) * 60))
    }
  }

  test("TypedRwWheel round-trips through the compact serde (Moments, BigInt)") {
    val agg = new WheelAggregators.MomentStats(scale = 2)
    assert(agg.partialSerde.isDefined)
    val tw = new TypedRwWheel(agg)
    (0 until 5000).foreach { i => tw.mergeLift(t0 + i % 300, (i * 13 % 100000).toLong) }
    val back = roundTrip(tw)
    assert(tw.freeze().range(t0, t0 + 300) == back.freeze().range(t0, t0 + 300))
  }

  test("TypedRwWheel falls back to per-object serialization without a serde") {
    val agg = WheelSerdeSpec.BagAgg
    assert(agg.partialSerde.isEmpty)
    val tw = new TypedRwWheel(agg)
    (0 until 50).foreach { i => tw.mergeLift(t0 + i % 7, i.toLong) }
    val back = roundTrip(tw)
    assert(tw.freeze().range(t0, t0 + 7) == back.freeze().range(t0, t0 + 7))
  }

  test("RwWheel round-trips through Spark's KryoSerializer") {
    val rw = new RwWheel(scale = 2, hasValues = true, maxFutureSkewSec = Some(86400L))
    (0 until 2000).map(i => (t0 + (i * 37) % 5000, (i % 997) / 100.0))
      .sortBy(_._1).foreach { case (sec, v) =>
        rw.advanceTo(sec * 1000L); rw.insert(sec * 1000L, v)
      }
    val back = kryoTrip(rw)
    assert(back.scale == 2 && back.hasValues && back.maxFutureSkewSec.contains(86400L))
    assert(back.watermark == rw.watermark)
    assert(back.freeze().range(t0 - 10, t0 + 6000) == rw.freeze().range(t0 - 10, t0 + 6000))
    // and it stays usable: further ingest + merge after deserialization
    back.insert((t0 + 6000) * 1000L, 3.5)
    assert(back.freeze().range(t0, t0 + 7000).count == rw.freeze().range(t0, t0 + 7000).count + 1)
  }

  test("TypedRwWheel round-trips through Spark's KryoSerializer (serde + fallback)") {
    val hll = new WheelAggregators.HllDistinct(p = 9)
    val tw = new TypedRwWheel(hll)
    (0 until 5000).foreach { i => tw.mergeLift(t0 + i % 300, (i % 777).toLong) }
    val back = kryoTrip(tw)
    assert(back.agg.isInstanceOf[WheelAggregators.HllDistinct])
    assert(back.freeze().range(t0, t0 + 300) == tw.freeze().range(t0, t0 + 300))

    val bag = new TypedRwWheel(WheelSerdeSpec.BagAgg)
    (0 until 50).foreach { i => bag.mergeLift(t0 + i % 7, i.toLong) }
    val bagBack = kryoTrip(bag)
    assert(bagBack.freeze().range(t0, t0 + 7) == bag.freeze().range(t0, t0 + 7))
  }

  test("merge of a deserialized TypedRwWheel equals merge of the original") {
    val agg = new WheelAggregators.CmsFreq(d = 2, logW = 8)
    val a = new TypedRwWheel(agg)
    val b = new TypedRwWheel(agg)
    (0 until 3000).foreach { i => a.mergeLift(t0 + i % 50, (i % 31).toLong) }
    (0 until 3000).foreach { i => b.mergeLift(t0 + i % 60, (i % 17).toLong) }
    val viaSer = {
      val a2 = roundTrip(a); val b2 = roundTrip(b)
      a2.merge(b2).freeze().range(t0, t0 + 60)
    }
    val direct = a.merge(b).freeze().range(t0, t0 + 60)
    assert(viaSer.toSeq == direct.toSeq)
  }
}

object WheelSerdeSpec {
  /** Serde-less aggregator, top-level so serializing it does not drag the
    * spec instance into the stream. */
  final case class Bag(xs: List[Long])
  object BagAgg extends WheelAggregator[Long, Bag, Long] {
    val identity: Bag = Bag(Nil)
    def lift(u: Long): Bag = Bag(List(u))
    def combine(a: Bag, b: Bag): Bag = Bag(a.xs ++ b.xs)
    def lower(p: Bag): Long = p.xs.sum
  }
}
