package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `topk_pairs(score, id, k)` ([[TopKPairsAgg]]) — the bounded-heap
  * top-k-per-group aggregate that replaces the rank-limit window in the
  * ANN pipelines. Pinned here: exact equality with the window form it
  * replaces (same (score desc, id asc) total order, ties included),
  * partitioning independence, the serialize/merge path, bounded buffers,
  * null/NaN skipping, and argument validation. */
class TopKPairsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def seeded(n: Int, groups: Int, tieEvery: Int): DataFrame = {
    graft.Graft.registerFunctions(spark)
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(0x70B4C5L)
    // deliberate score ties (quantized scores) so the id tie-break is
    // exercised at the k-th boundary, not just in theory
    (0 until n).map { i =>
      (rnd.nextInt(groups).toLong, i.toLong,
        math.floor(rnd.nextDouble() * tieEvery).toDouble / tieEvery)
    }.toDF("g", "id", "s")
  }

  private def viaWindow(df: DataFrame, k: Int): Set[(Long, Long)] =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("id"))))
      .where(col("rn") <= k)
      .select("g", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def viaAgg(df: DataFrame, k: Int): Set[(Long, Long)] =
    df.groupBy("g").agg(expr(s"topk_pairs(s, id, $k)").as("tk"))
      .select(col("g"), explode(col("tk")).as("p"))
      .select(col("g"), col("p").getField("i").as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("equals the rank-limit window it replaces, ties and all, under any partitioning") {
    val df = seeded(20000, 7, 50)
    val expected = viaWindow(df, 10)
    assert(viaAgg(df, 10) === expected)
    assert(viaAgg(df.repartition(13), 10) === expected, "partitioning must not matter")
    assert(viaAgg(df.repartition(1), 10) === expected)
    // groups smaller than k return whole groups, like the window
    val small = seeded(40, 20, 5)
    assert(viaAgg(small, 10) === viaWindow(small, 10))
  }

  test("result array is sorted best-first with scores attached") {
    val df = seeded(5000, 3, 10)
    val rows = df.groupBy("g").agg(expr("topk_pairs(s, id, 8)").as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("g"), col("pos"),
        col("p").getField("s").as("s"), col("p").getField("i").as("id"))
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getInt(1)).map(r => (r.getDouble(2), r.getLong(3)))
      ordered.sliding(2).foreach {
        case Array((s1, i1), (s2, i2)) =>
          assert(s1 > s2 || (s1 == s2 && i1 < i2),
            s"array not in (score desc, id asc) order: ($s1,$i1) before ($s2,$i2)")
        case _ => ()
      }
    }
  }

  test("nulls and NaN scores are skipped; empty group yields empty array") {
    graft.Graft.registerFunctions(spark)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 1L, 1.0D), (1L, 2L, CAST('NaN' AS DOUBLE)),
        |  (1L, CAST(NULL AS BIGINT), 9.0D), (1L, 3L, CAST(NULL AS DOUBLE)),
        |  (2L, 4L, CAST('NaN' AS DOUBLE))
        |AS t(g, id, s)""".stripMargin)
    val got = df.groupBy("g").agg(expr("topk_pairs(s, id, 3)").as("tk")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)))
      .toMap
    assert(got(1L) === Seq(1L), "null id, null score, and NaN rows must be skipped")
    assert(got(2L) === Seq.empty, "a group of only-NaN rows yields an empty array")
  }

  test("DOCUMENTED divergence vs the window form: null/NaN rows are dropped, not ranked") {
    // Spark's sort order places NaN above +Infinity and nulls last-but-
    // emitted, so the rank-limit window RETURNS NaN/null-score rows when a
    // group holds fewer than k well-scored candidates; topk_pairs skips
    // them (scaladoc'd). This pins the divergence so the "replaces the
    // window" claim is scoped honestly: identical on null/NaN-free scores
    // (graft's similarity scores, where norms are > 0 by construction),
    // deliberately different on pathological ones.
    graft.Graft.registerFunctions(spark)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 1L, 0.5D), (1L, 2L, CAST('NaN' AS DOUBLE)), (1L, 3L, CAST(NULL AS DOUBLE))
        |AS t(g, id, s)""".stripMargin)
    val win = viaWindow(df, 3)
    val agg = viaAgg(df, 3)
    assert(win === Set((1L, 2L), (1L, 1L), (1L, 3L)),
      "the window emits NaN first and the null-score row last")
    assert(agg === Set((1L, 1L)),
      "the aggregate keeps only well-scored rows")
  }

  test("serialize/deserialize round-trips and merge keeps the global top-k") {
    val agg = TopKPairsAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.LongType, nullable = true), 3)
    val a = agg.createAggregationBuffer()
    Seq((0.5, 10L), (0.9, 11L), (0.1, 12L)).foreach { case (s, i) => a.offer(s, i) }
    val b = agg.deserialize(agg.serialize(agg.createAggregationBuffer()))
    Seq((0.7, 20L), (0.9, 9L), (0.05, 21L)).foreach { case (s, i) => b.offer(s, i) }
    val merged = agg.merge(a, agg.deserialize(agg.serialize(b)))
    assert(merged.len === 3, "buffer must stay bounded at k through merges")
    val out = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    val pairs = (0 until out.numElements()).map { i =>
      val r = out.get(i, null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      (r.getDouble(0), r.getLong(1))
    }
    // global top-3 of the six offers, score desc then id asc on the 0.9 tie
    assert(pairs === Seq((0.9, 9L), (0.9, 11L), (0.7, 20L)))
  }

  test("argument validation: k bounds, literal-only k, type checks") {
    graft.Graft.registerFunctions(spark)
    val df = seeded(10, 2, 5)
    assertThrows[Exception](df.groupBy("g").agg(expr("topk_pairs(s, id, 0)")).collect())
    assertThrows[Exception](df.groupBy("g").agg(expr("topk_pairs(s, id)")).collect())
    assertThrows[Exception] {
      val bad = df.withColumn("txt", lit("x"))
      bad.groupBy("g").agg(expr("topk_pairs(txt, id, 3)")).collect()
    }
    // float scores and int ids are accepted (widened)
    val widened = seeded(100, 2, 5)
      .withColumn("s", col("s").cast("float"))
      .withColumn("id", col("id").cast("int"))
    assert(viaAgg(widened.withColumn("s", col("s").cast("double"))
      .withColumn("id", col("id").cast("long")), 4).nonEmpty)
    assert(widened.groupBy("g").agg(expr("topk_pairs(s, id, 4)").as("tk"))
      .select(explode(col("tk"))).count() === 8)
  }
}
