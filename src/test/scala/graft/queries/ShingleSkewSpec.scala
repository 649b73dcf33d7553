package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hot-shingle skew: one shingle shared by 1,000 documents inflates a single
  * per-shingle doc list into ~500k in-task pairs in the exact form. The
  * df-capped form excludes such stop shingles from pair generation, bounding
  * per-list work at capDf²/2 while (on any corpus) returning a subset of the
  * exact pairs — and on this corpus the exact SAME pairs, because pairs whose
  * only overlap is a ubiquitous shingle can't reach the 0.5 Jaccard bar.
  */
class ShingleSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("df cap bounds hot-shingle pair-gen and keeps true near-dup pairs") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // 1,000 docs all sharing the shingle "common hot phrase"; two planted
    // exact-duplicate pairs with rare shingles only
    val hot = (0 until 1000).map(i => (i.toLong, s"common hot phrase u${i}x u${i}y"))
    val planted = Seq(
      (5001L, "alpha beta gamma delta epsilon zeta"),
      (5002L, "alpha beta gamma delta epsilon zeta"),
      (6001L, "one two three four five six seven"),
      (6002L, "one two three four five six seven"))
    (hot ++ planted).toDF("doc_id", "text").createOrReplaceTempView("documents")
    val expected = Set((5001L, 5002L), (6001L, 6002L))

    val t0 = System.nanoTime()
    val capped = spark.sql(TextQueries.shingleJaccardSparkSql(Some(TextQueries.ShingleCapDf)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cappedSec = (System.nanoTime() - t0) / 1e9
    info(f"capped: $cappedSec%.2f s")
    assert(capped === expected)
    assert(cappedSec < 30.0, f"capped form took $cappedSec%.1f s — cap is not bounding work")

    // exact form agrees here (hot-only pairs have Jaccard 1/5 < 0.5) but pays
    // the ~500k-pair hot list to find that out
    val t1 = System.nanoTime()
    val exact = spark.sql(TextQueries.shingleJaccardSparkSql(None))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    info(f"exact: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    assert(exact === expected)
    spark.catalog.dropTempView("documents")
  }
}
