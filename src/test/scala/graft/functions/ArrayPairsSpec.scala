package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `array_pairs(ds)` replaces the dedup family's hot HOF pair chain — it
  * must be ELEMENT-IDENTICAL (values AND order) to
  * `flatten(transform(ds, (x, xi) -> transform(slice(ds, xi + 2, size(ds)),
  *                                             y -> named_struct('i', x, 'j', y))))`
  * because the shingle-Jaccard entries count the exploded pairs it
  * produces. */
class ArrayPairsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val setup: Unit = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)
  }

  test("fuzzed equivalence with the HOF chain over long lists") {
    setup
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(0xa99a17L)
    // sorted distinct id lists of sizes 0..40, the shape collect_list +
    // sort_array feeds the pair stage (plus unsorted/duplicate stress: the
    // expression must not assume sortedness even though callers sort)
    val lists = (0 until 500).map { i =>
      val len = rnd.nextInt(41)
      val raw = (0 until len).map(_ => rnd.nextLong() % 1000)
      (i, if (i % 3 == 0) raw else raw.sorted)
    }
    lists.toDF("id", "ds").createOrReplaceTempView("ap_lists")
    val bad = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT flatten(transform(ds, (x, xi) ->
        |           transform(slice(ds, xi + 2, size(ds)),
        |                     y -> named_struct('i', x, 'j', y)))) AS a,
        |         array_pairs(ds) AS b
        |  FROM ap_lists) WHERE a <> b""".stripMargin)
      .collect()(0).getLong(0)
    assert(bad == 0L, s"$bad lists diverged from the HOF chain")
  }

  test("string element type and edge shapes") {
    setup
    val r = spark.sql(
      """SELECT array_pairs(array('a', 'b', 'c')) AS abc,
        |       array_pairs(array('x')) AS single,
        |       array_pairs(array()) AS empty,
        |       array_pairs(CAST(NULL AS ARRAY<STRING>)) AS nul""".stripMargin)
      .collect()(0)
    assert(r.getSeq[org.apache.spark.sql.Row](0).map(p => (p.getString(0), p.getString(1))) ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(r.getSeq[Any](1).isEmpty)
    assert(r.getSeq[Any](2).isEmpty)
    assert(r.isNullAt(3))
  }

  test("explode(array_pairs(ds)) matches the served pair CTE end-to-end") {
    setup
    val session = spark
    import session.implicits._
    Seq((1L, Seq(10L, 20L, 30L, 40L))).toDF("g", "ds").createOrReplaceTempView("ap_one")
    val got = spark.sql(
      "SELECT p.i, p.j FROM ap_one LATERAL VIEW explode(array_pairs(ds)) t AS p ORDER BY i, j")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 20L), (10L, 30L), (10L, 40L),
                      (20L, 30L), (20L, 40L), (30L, 40L)))
  }
}
