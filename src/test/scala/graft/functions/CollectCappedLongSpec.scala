package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `collect_capped_long` is the hot-bucket guard of
  * [[graft.queries.SimilarityQueries.bandedCandidates]]: it must (a) be
  * bit-identical to `sort_array(collect_list(col))` for groups at or under
  * the cap, (b) report size exactly `cap + 1` for any group over the cap so
  * the downstream BETWEEN filter's keep/drop decision matches the uncapped
  * form, and — the round-12 scale finding — (c) NEVER hold more than
  * `cap + 1` elements in an aggregation buffer, so a degenerate LSH bucket
  * is discarded before it materializes. */
class CollectCappedLongSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val setup: Unit = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)
  }

  test("buffer is hard-bounded at cap+1 through update and merge (guard precedes materialization)") {
    val cap = 64
    val agg = CollectCappedLong(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true), cap)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    // one partial fed 10x the cap: the backing array must never grow past cap+1
    val buf = agg.createAggregationBuffer()
    (0 until cap * 10).foreach { i =>
      row.update(0, java.lang.Long.valueOf(i.toLong))
      agg.update(buf, row)
      assert(buf.arr.length <= cap + 1, s"buffer grew to ${buf.arr.length} at row $i")
    }
    assert(buf.len == cap + 1)
    // merging many full partials must not grow it either
    val merged = agg.createAggregationBuffer()
    (0 until 10).foreach { _ =>
      agg.merge(merged, buf)
      assert(merged.arr.length <= cap + 1)
    }
    assert(merged.len == cap + 1)
    // serialize round-trip carries at most cap+1 elements
    val bytes = agg.serialize(merged)
    assert(bytes.length <= 4 + 8 * (cap + 1))
    assert(agg.deserialize(bytes).len == cap + 1)
  }

  test("under-cap groups are bit-identical to sort_array(collect_list); over-cap size is cap+1") {
    setup
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(0xcc13L)
    // groups of size 1..20 under a cap of 12, plus two over-cap groups
    val rows = (0 until 40).flatMap { g =>
      val n = 1 + rnd.nextInt(20)
      (0 until n).map(i => (g.toLong, rnd.nextLong() % 100000))
    }
    rows.toDF("g", "v").createOrReplaceTempView("ccl_rows")
    val diverged = spark.sql(
      """SELECT g, collect_capped_long(v, 12) AS capped,
        |       sort_array(collect_list(v)) AS full
        |FROM ccl_rows GROUP BY g""".stripMargin)
      .where(
        (size($"full") <= 12 && $"capped" =!= $"full") ||
        (size($"full") > 12 && size($"capped") =!= lit(13)))
      .count()
    assert(diverged == 0L)
  }

  test("bandedCandidates pair set is unchanged vs the uncapped collect_list form, over-cap bucket dropped") {
    setup
    val session = spark
    import session.implicits._
    // synthetic band rows: healthy buckets of 2-5 ids, plus one degenerate
    // bucket (band 0, bk 999) shared by 300 ids — far over maxBucket=100
    val healthy = (0 until 50).flatMap { b =>
      val ids = (0 until 2 + b % 4).map(i => (b * 100 + i).toLong)
      ids.map(id => (id, b % 7, b))
    }
    val hot = (0 until 300).map(i => (90000L + i, 0, 999))
    val bands = (healthy ++ hot).toDF("id", "band", "bk")
    val got = graft.queries.SimilarityQueries
      .bandedCandidates(bands, "id", maxBucket = 100)
      .as[(Long, Long)].collect().toSet
    // reference: the uncapped r12 form (collect_list then filter)
    val ref = bands.groupBy("band", "bk")
      .agg(sort_array(collect_list($"id")).as("ids"))
      .where(size($"ids").between(2, 100))
      .select(explode(expr("array_pairs(ids)")).as("p"))
      .select($"p.i", $"p.j")
      .where($"i" < $"j").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got == ref)
    assert(got.nonEmpty)
    // the hot bucket contributed nothing
    assert(!got.exists { case (i, j) => i >= 90000L || j >= 90000L })
  }

  test("one-shuffle shape retained: capped collect plans like collect_list (r11 win kept)") {
    setup
    val session = spark
    import session.implicits._
    val bands = (0 until 100).map(i => (i.toLong, i % 7, i % 13)).toDF("id", "band", "bk")
    // AQE's wrapper node hides the physical tree from collect(); plan the
    // candidate stage with adaptive off — the static plan is what shapes
    // the stage count either way
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (plan, exchanges) =
      try {
        val cand = graft.queries.SimilarityQueries.bandedCandidates(bands, "id")
        val p = cand.queryExecution.executedPlan // physical planning reads the conf HERE
        (p, p.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        })
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // one shuffle to the (band, bk) buckets + one for the cross-band
    // distinct — the pre-r12 window-count + self-join form planned three.
    // The buffer-bounding rewrite must not have re-introduced a stage.
    assert(exchanges.nonEmpty && exchanges.length <= 2,
      s"candidate stage grew to ${exchanges.length} shuffles:\n$plan")
    // and the aggregation is the same object-hash shape collect_list uses
    val objAggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(objAggs.nonEmpty, s"capped collect should plan as ObjectHashAggregate:\n$plan")
  }
}
