package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming LSH gate must be the batch candidate stage, incrementally:
  * same signatures, same band keys, and — over the same corpus — the same
  * emitted pair set, regardless of how the stream is chopped into
  * micro-batches. */
class StreamingNearDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("map-side signatures equal the batch explode+groupBy+min form") {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.registerFunctions(spark)
    // batch form: explode distinct shingles, min per doc (minhashLsh's)
    val sh = docs.where(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), explode(expr("word_ngrams(split(text, ' '), 3)")).as("s"))
    val batchSig = sh.groupBy("doc_id")
      .agg(min(xxhash64(lit(0), col("s"))).as("m0"), min(xxhash64(lit(63), col("s"))).as("m63"))
    // map-side form: array_min over the row's distinct shingle array
    val rowSig = docs.where(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        array_min(transform(expr("word_ngrams(split(text, ' '), 3)"),
          s => xxhash64(lit(0), s))).as("m0"),
        array_min(transform(expr("word_ngrams(split(text, ' '), 3)"),
          s => xxhash64(lit(63), s))).as("m63"))
    val diff = batchSig.as("a").join(rowSig.as("b"), "doc_id")
      .where(col("a.m0") =!= col("b.m0") || col("a.m63") =!= col("b.m63"))
    assert(diff.count() === 0L)
  }

  test("streamed candidates equal the batch banded candidate set") {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.registerFunctions(spark)
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = docs.as[(Long, String)].collect().toSeq
    assert(all.size >= 100)
    // batch truth: the same band keys through the batch bucket-pair stage
    val expected = graft.queries.SimilarityQueries.bandedCandidates(
        StreamingNearDup.bandKeys(docs, "doc_id", "text"), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "corpus has no LSH candidate pairs?")

    val input = MemoryStream[(Long, String)]
    val pairs = StreamingNearDup.candidates(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = pairs.toDF("i", "j").writeStream
      .format("memory").queryName("near_dup_gate").outputMode("update").start()
    try {
      // three uneven micro-batches: pairs must not depend on the chop
      input.addData(all.take(100))
      q.processAllAvailable()
      input.addData(all.slice(100, 150))
      q.processAllAvailable()
      input.addData(all.drop(150))
      q.processAllAvailable()
      val got = spark.table("near_dup_gate")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("streamed EMBEDDING candidates equal the batch SRP candidate set") {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.registerFunctions(spark)
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // batch truth through the same band keys and the batch bucket stage
    import graft.queries.SimilarityQueries.{SrpBits, SrpRowsPerBand}
    val bands = emb.select(col("vec_id").cast("long").as("id"),
      posexplode(expr(s"srp_band_keys(embedding, $SrpBits, $SrpRowsPerBand)"))
        .as(Seq("band", "bk")))
    val expected = graft.queries.SimilarityQueries.bandedCandidates(bands, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "corpus has no SRP candidate pairs?")
    val all = emb.as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val pairs = StreamingNearDup.embeddingCandidates(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding")
    val q = pairs.toDF("i", "j").writeStream
      .format("memory").queryName("near_dup_emb").outputMode("update").start()
    try {
      input.addData(all.take(all.size / 2))
      q.processAllAvailable()
      input.addData(all.drop(all.size / 2))
      q.processAllAvailable()
      val got = spark.table("near_dup_emb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("a frozen bucket stops emitting past the cap") {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.registerFunctions(spark)
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 8 identical docs → every band bucket holds all 8; cap 3 freezes after
    // the third member: C(3,2)=3 pairs per band, and ids 4..8 add nothing
    val same = (1L to 8L).map(i => (i, "alpha beta gamma delta"))
    val input = MemoryStream[(Long, String)]
    val pairs = StreamingNearDup.candidates(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", maxBucket = 3)
    val q = pairs.toDF("i", "j").writeStream
      .format("memory").queryName("near_dup_frozen").outputMode("update").start()
    try {
      input.addData(same)
      q.processAllAvailable()
      val got = spark.table("near_dup_frozen")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // only the first 3 ids to REACH the state group pair up; groupByKey
      // gives no intra-group arrival-order guarantee, so assert the
      // structural property, not literal ids: exactly C(3,2)=3 distinct
      // pairs forming a triangle over exactly 3 distinct member ids
      val members = got.flatMap { case (i, j) => Set(i, j) }
      assert(members.size === 3, s"expected 3 gated ids, got $members")
      assert(members.subsetOf((1L to 8L).toSet))
      assert(got === (for { a <- members; b <- members if a < b } yield (a, b)))
    } finally q.stop()
  }

  test("over-cap divergence is exactly as designed: frozen buckets keep their pre-freeze pairs, batch drops them; the non-frozen mass matches") {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.registerFunctions(spark)
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cap = 3
    // 8 identical docs → every bucket they land in grows PAST cap=3 and
    // freezes (frozen-bucket count is nonzero); two healthy duplicate
    // groups of sizes 2 and 3 (= cap, never frozen) in disjoint buckets
    val hotIds = (1L to 8L)
    val corpus =
      hotIds.map(i => (i, "alpha beta gamma delta")) ++
      Seq(101L, 102L).map(i => (i, "one two three four five")) ++
      Seq(201L, 202L, 203L).map(i => (i, "zeta eta theta iota kappa"))
    val docsDf = corpus.toDF("doc_id", "text")
    // batch truth at the same cap: hot buckets are dropped wholesale
    val batch = graft.queries.SimilarityQueries.bandedCandidates(
        StreamingNearDup.bandKeys(docsDf, "doc_id", "text"), "id", maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!batch.exists { case (i, j) => hotIds.contains(i) || hotIds.contains(j) },
      "batch must drop the over-cap buckets entirely")
    assert(batch === Set((101L, 102L), (201L, 202L), (201L, 203L), (202L, 203L)))

    val input = MemoryStream[(Long, String)]
    val pairs = StreamingNearDup.candidates(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", maxBucket = cap)
    val q = pairs.toDF("i", "j").writeStream
      .format("memory").queryName("near_dup_divergence").outputMode("update").start()
    try {
      input.addData(corpus)
      q.processAllAvailable()
      val got = spark.table("near_dup_divergence")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val (hotPairs, healthyPairs) =
        got.partition { case (i, j) => hotIds.contains(i) || hotIds.contains(j) }
      // non-frozen mass: identical to batch
      assert(healthyPairs === batch)
      // frozen buckets: the documented divergence — the C(cap,2) pre-freeze
      // triangle survives (arrival order within the group is not guaranteed,
      // so assert the shape, not the ids)
      val hotMembers = hotPairs.flatMap { case (i, j) => Set(i, j) }
      assert(hotMembers.size === cap)
      assert(hotMembers.subsetOf(hotIds.toSet))
      assert(hotPairs === (for { a <- hotMembers; b <- hotMembers if a < b } yield (a, b)))
    } finally q.stop()
  }

  test("idleEvict bounds total state: idle buckets drop, pairs within the window still emit") {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.registerFunctions(spark)
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val pairs = StreamingNearDup.candidates(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idleEvict = Some(java.time.Duration.ofMillis(1000)))
    // NOTE: with ProcessingTimeTimeout the micro-batch engine's
    // shouldRunAnotherBatch is permanently true (any batch could expire a
    // timeout), so q.processAllAvailable() LIVELOCKS — synchronize on the
    // sink's contents instead, with a bounded poll.
    val q = pairs.toDF("i", "j").writeStream
      .format("memory").queryName("near_dup_ttl").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .start()
    def gotPairs() = spark.table("near_dup_ttl")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def awaitPairs(want: Set[(Long, Long)]): Set[(Long, Long)] = {
      val deadline = System.currentTimeMillis + 30000
      while (gotPairs() != want && System.currentTimeMillis < deadline) Thread.sleep(100)
      gotPairs()
    }
    try {
      // batch 1: doc 1 seeds its buckets; doc 2 (same text) inside the
      // idle window pairs with it
      input.addData((1L, "alpha beta gamma delta"))
      Thread.sleep(100)
      input.addData((2L, "alpha beta gamma delta"))
      assert(awaitPairs(Set((1L, 2L))) === Set((1L, 2L)))
      // let the buckets go idle well past the TTL (eviction batches fire on
      // the processing-time trigger), then re-send the SAME text: its
      // buckets restarted empty, so doc 3 pairs with nobody — the
      // documented idleness-window semantics — while doc 4 right after
      // doc 3 pairs with it in the fresh window. Once (3,4) is visible,
      // doc 3's batch has committed, so any illegal (1,3)/(2,3) pair
      // would already be in the table — the final set equality is a
      // race-free negative assertion.
      Thread.sleep(5000)
      input.addData((3L, "alpha beta gamma delta"))
      Thread.sleep(100)
      input.addData((4L, "alpha beta gamma delta"))
      assert(awaitPairs(Set((1L, 2L), (3L, 4L))) === Set((1L, 2L), (3L, 4L)),
        "evicted buckets must not pair across the idle window")
    } finally q.stop()
  }
}
