package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-19 operator-internal rewrites to their replaced forms —
  * each optimization here claimed an exact algebraic identity, and these
  * tests hold the two sides equal element-for-element so a later edit
  * cannot silently turn "regrouped" into "approximated".
  *
  *  1. simhashSig votes fold over raw occurrences; identity:
  *     sum over distinct (doc, word) of cnt·sign(bit) ≡ sum over
  *     occurrences of sign(bit).
  *  2. Bounded top-k outputs order via a single-partition sort; identity:
  *     (qi, xi) is a unique key, so the no-exchange sort is the same total
  *     order ORDER BY produced — and the plan must carry NO range exchange.
  *  3. The star fixpoint's `inputDistinct` flag skips only the dedup
  *     shuffle; identity: the pair SQL's output is already distinct, so
  *     both paths yield the same clusters.
  *  4. Loaded ANN artifacts carry the fine rows collected at load;
  *     identity: searching with the cache ≡ searching with the cache
  *     stripped (the pre-r19 collect path).
  */
class R19RegroupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("simhashSig occurrence-fold ≡ the replaced count-weighted fold, bit-for-bit") {
    Q.ctx(spark, sf)
    val got = SimilarityQueries.simhashSig(spark, sigWords = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the pre-r19 shape, reconstructed verbatim: (doc, word) counts first,
    // then cnt-weighted votes
    val words = spark.table("documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .withColumn("h0", xxhash64(col("w")))
    val voteCols = (0 until 64).map(i =>
      sum(col("cnt") * when(expr(s"(shiftright(h0, $i) & 1) = 1"), 1).otherwise(-1))
        .as(s"v$i"))
    val sig = (0 until 64)
      .map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    val old = words.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), sig.as("s0"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty && got === old)
  }

  test("bounded top-k ordering: no range exchange, rows in (qi, xi) total order") {
    Q.ctx(spark, sf)
    val df = SimilarityQueries.annTopK(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      "bounded top-k output must not pay a range exchange")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.nonEmpty && rows === rows.sorted,
      "single-partition sort must yield the global (qi, xi) order")
  }

  test("star fixpoint: inputDistinct = true ≡ default on the (distinct) pair SQL") {
    Q.ctx(spark, sf)
    val pairSql = TextQueries.shingleJaccardSparkSql(
      capDf = Some(TextQueries.ShingleCapDf), ordered = false)
    def clusters(inputDistinct: Boolean): Set[(Long, Long)] =
      PipelineQueries.connectedComponents(spark.sql(pairSql), inputDistinct)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dedup = clusters(inputDistinct = false)
    val skip = clusters(inputDistinct = true)
    assert(dedup.nonEmpty && skip === dedup)
  }

  test("loaded ANN artifacts: fine-row cache present and search-identical to the collect path") {
    Q.ctx(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-r19-ann").toString
    try {
      val art = AnnIndexIO.save(spark, dir, s"$sf/embeddings.parquet")
      assert(art.fineRowsCache.isDefined, "load must collect the fines once")
      val e = SimilarityQueries.vecsOf(spark.read.parquet(s"$sf/embeddings.parquet"))
      val served = SimilarityQueries.rpqSearch(art, e)
        .collect().map(_.toString).toSeq
      val uncached = SimilarityQueries.rpqSearch(art.copy(fineRowsCache = None), e)
        .collect().map(_.toString).toSeq
      assert(served.nonEmpty && served === uncached)
    } finally {
      val ds = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try ds.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally ds.close()
    }
  }
}
