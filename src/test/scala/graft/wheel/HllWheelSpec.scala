package graft.wheel

import org.scalatest.funsuite.AnyFunSuite

import WheelAggregators.HllDistinct

/** The HLL distinct-count aggregator on the typed wheel surface.
  *
  * The load-bearing property is BIT-EXACT agreement between the wheel's
  * greedy level decomposition and a flat fold over the same rows: register
  * max is commutative, associative and idempotent, so any grouping of the
  * same inputs must produce the identical register array — the wheel adds
  * zero sketch error on top of HLL's own. Accuracy itself is then checked
  * against exact distinct counts at several cardinalities.
  */
class HllWheelSpec extends AnyFunSuite {

  private val t0 = 1715299200L
  private val hll = new HllDistinct(11) // 2 KiB registers, stderr ~2.3 %

  private def flatEstimate(users: Seq[Long]): Long =
    hll.lower(users.foldLeft(hll.identity)((acc, u) => hll.combine(acc, hll.lift(u))))

  private def rows(n: Int, span: Int, users: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => (t0 + rnd.nextInt(span), rnd.nextInt(users).toLong))
  }

  private def wheelOf(rs: Seq[(Long, Long)]): TypedHawWheel[Array[Byte], Long] = {
    val rw = new TypedRwWheel(hll)
    rs.sortBy(_._1).foreach { case (sec, u) => rw.insert(sec * 1000L, u) }
    rw.freeze()
  }

  test("wheel range sketch is bit-exact vs a flat fold over the same rows") {
    val rs = rows(n = 20000, span = 3 * 86400, users = 5000, seed = 7)
    val w = wheelOf(rs)
    val ranges = Seq(
      (t0, t0 + 86400L),                 // one day
      (t0 + 100L, t0 + 90000L),          // unaligned, crosses a day
      (t0 - 10L, t0 + 4 * 86400L),       // superset of all data
      (t0 + 5000L, t0 + 5000L + 3600L),  // one mid-stream hour
      (t0 + 50L, t0 + 50L))              // empty
    for ((s, e) <- ranges) {
      val in = rs.filter(r => r._1 >= s && r._1 < e).map(_._2)
      assert(w.range(s, e) === flatEstimate(in), s"range [$s, $e)")
    }
  }

  test("duplicates are free: re-inserting the same users changes nothing") {
    val base = rows(n = 3000, span = 86400, users = 800, seed = 11)
    val dup = base ++ base ++ base.map { case (s, u) => (s + 1, u) }
    assert(wheelOf(base).range(t0, t0 + 2 * 86400L) ===
      flatEstimate(base.map(_._2).distinct))
    assert(wheelOf(dup).range(t0, t0 + 2 * 86400L) ===
      flatEstimate(base.map(_._2).distinct))
  }

  test("freeze snapshots are isolated from continued (mutating) ingest") {
    val rs = rows(n = 2000, span = 3600, users = 500, seed = 23)
    val rw = new TypedRwWheel(hll)
    rs.sortBy(_._1).foreach { case (sec, u) => rw.insert(sec * 1000L, u) }
    val snap = rw.freeze()
    val before = snap.range(t0, t0 + 3600L)
    // keep ingesting into the SAME seconds — HllDistinct.accumulate mutates
    // its register arrays in place, which must not reach the frozen view
    val more = rows(n = 2000, span = 3600, users = 5000, seed = 29)
    more.sortBy(_._1).foreach { case (sec, u) => rw.insert(sec * 1000L, u) }
    assert(snap.range(t0, t0 + 3600L) === before)
    assert(rw.freeze().range(t0, t0 + 3600L) ===
      flatEstimate((rs ++ more).map(_._2)))
  }

  test("merge across ingest wheels equals one wheel (executor tree-merge)") {
    val rs = rows(n = 10000, span = 2 * 86400, users = 3000, seed = 13)
    val (a, b) = rs.zipWithIndex.partition(_._2 % 2 == 0)
    val wa = new TypedRwWheel(hll)
    a.map(_._1).sortBy(_._1).foreach { case (sec, u) => wa.insert(sec * 1000L, u) }
    val wb = new TypedRwWheel(hll)
    b.map(_._1).sortBy(_._1).foreach { case (sec, u) => wb.insert(sec * 1000L, u) }
    val merged = wa.merge(wb).freeze()
    val single = wheelOf(rs)
    for ((s, e) <- Seq((t0, t0 + 86400L), (t0 - 5L, t0 + 3 * 86400L)))
      assert(merged.range(s, e) === single.range(s, e))
  }

  test("distributed build over the events table is bit-exact vs a local fold") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    // distinct users per time range; repartition so the tree-merge is real
    val w = graft.index.TypedWheelBuild.build(
      ev.repartition(7), "ts", col("user_id"), hll,
      (r: org.apache.spark.sql.Row) => r.getLong(1))
    // cast first: works for TIMESTAMP and (under the UTC session above,
    // where wall == instant) TIMESTAMP_NTZ corpus layouts alike
    val pairs = ev.select(expr("unix_micros(cast(ts as timestamp)) div 1000000").as("sec"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lo = pairs.map(_._1).min
    val hi = pairs.map(_._1).max + 1
    for ((s, e) <- Seq((lo, hi), (lo, lo + 86400L), (lo + 86400L, lo + 5 * 86400L),
                       (hi - 3600L, hi))) {
      val in = pairs.filter(p => p._1 >= s && p._1 < e).map(_._2)
      assert(w.range(s, e) === flatEstimate(in), s"range [$s, $e)")
      assert(in.isEmpty || w.range(s, e) > 0)
    }
  }

  test("estimates land within 4 standard errors of exact distinct counts") {
    val stderr = 1.04 / math.sqrt(1 << 11)
    for (users <- Seq(100, 2000, 50000)) {
      val rs = rows(n = math.max(users * 2, 1000), span = 86400, users = users, seed = users)
      val exact = rs.map(_._2).distinct.size
      val est = wheelOf(rs).range(t0, t0 + 2 * 86400L).toDouble
      val relErr = math.abs(est - exact) / exact
      assert(relErr <= 4 * stderr + 0.01,
        s"users=$users exact=$exact est=$est relErr=$relErr")
    }
  }
}
