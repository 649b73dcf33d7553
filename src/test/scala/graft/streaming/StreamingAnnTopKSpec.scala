package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQueries

/** The streaming ANN ingest tier must BE the batch residual-PQ tier,
  * incrementally: same frozen artifacts, bit-identical routing/encode/ADC
  * arithmetic, and — over an id-monotone stream — a global top-k per
  * arrival equal to the batch prefix query ("top-k by ADC among xi < qi in
  * qi's probed buckets"), regardless of micro-batch chopping. */
class StreamingAnnTopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Graft.registerFunctions(s)
    s
  }

  private val sf = "/root/testdata/sf0.001"
  private val K = 5

  private def corpus: DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")

  /** Batch ground truth with the SAME frozen artifacts: for every vector q,
    * the global top-K by (asim desc, xi asc) among the STRICT PREFIX
    * xi < q inside q's nprobe probed buckets — the retrospective form of
    * "top-k among everything already ingested" for an id-ordered stream. */
  private def batchPrefixTopK(
      art: SimilarityQueries.RpqArtifacts, e: DataFrame): Set[(Long, Long, Double)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}
    val codes = SimilarityQueries.rpqEncodeFrozen(art, e)
    val qluts = e.select(col("vec_id").as("qi"),
      cc(graft.functions.PqLut(ce(col("v")), art.cents,
        SimilarityQueries.RpqM, art.ks)).as("lut"),
      col("nrm").as("nq"))
    val nprobe = SimilarityQueries.nprobeFor(art.n)
    val probes = e.join(broadcast(art.fines), lit(true))
      .withColumn("qdotc", expr("vec_dot(v, vc)"))
      .withColumn("csim", col("qdotc") / (col("nrm") * col("nc")))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))))
      .where(col("crn") <= nprobe)
      .select(col("vec_id").as("qi"), col("cid"), col("qdotc"))
      .join(broadcast(qluts), "qi")
    probes.join(codes, Seq("cid"))
      .where(col("xi") < col("qi")) // the strict prefix
      .withColumn("asim",
        (col("qdotc") + cc(graft.functions.PqAdc(ce(col("lut")), ce(col("codes")))))
          / (col("nq") * col("nx")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qi").orderBy(col("asim").desc, col("xi"))))
      .where(col("rn") <= K)
      .select(col("qi"), col("xi"), col("asim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def runGate(fz: StreamingAnnTopK.FrozenAnn,
      rows: Seq[(Long, Array[Float])], chops: Seq[Int],
      on: SparkSession = spark): Set[(Long, Long, Double)] = {
    val session = on
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val name = s"ann_gate_${chops.mkString("_")}"
    val q = StreamingAnnTopK.topKCandidates(
        input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", fz, K)
      .toDF("qi", "xi", "asim")
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      var rest = rows
      chops.foreach { c =>
        val (batch, tail) = rest.splitAt(c)
        if (batch.nonEmpty) { input.addData(batch); q.processAllAvailable() }
        rest = tail
      }
      if (rest.nonEmpty) { input.addData(rest); q.processAllAvailable() }
      // global top-k per query from the per-bucket candidates
      StreamingAnnTopK.mergeTopK(session.table(name), K)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally q.stop()
  }

  test("gate == batch prefix top-k, bit-identical scores, across choppings") {
    spark.sparkContext.setLogLevel("WARN")
    val session = spark
    import session.implicits._
    val e = SimilarityQueries.vecsOf(corpus)
    val n = corpus.count()
    val art = SimilarityQueries.rpqArtifactsOf(e, n)
    val fz = StreamingAnnTopK.freeze(art)
    assert(fz.fineIds.length >= 2 && fz.nprobe >= 10)

    val expected = batchPrefixTopK(art, e)
    assert(expected.nonEmpty)

    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    // one batch; three uneven batches; many tiny batches — identical output
    val got1 = runGate(fz, rows, Seq(rows.size))
    val got3 = runGate(fz, rows, Seq(rows.size / 3, rows.size / 2))
    val gotN = runGate(fz, rows, Seq.fill(rows.size / 7)(7))
    assert(got1 === expected)
    assert(got3 === expected)
    assert(gotN === expected)
  }

  test("gate == batch under the RocksDB provider (the production config)") {
    spark.sparkContext.setLogLevel("WARN")
    val session = spark
    import session.implicits._
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    rocks.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    graft.Graft.registerFunctions(rocks) // topk_pairs on the NEW session's registry
    val e = SimilarityQueries.vecsOf(corpus)
    val art = SimilarityQueries.rpqArtifactsOf(e, corpus.count())
    val fz = StreamingAnnTopK.freeze(art)
    val expected = batchPrefixTopK(art, e)
    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val got = runGate(fz, rows, Seq(rows.size / 2), on = rocks)
    assert(got === expected)
  }

  test("gate state survives a kill + restart from the RocksDB checkpoint") {
    spark.sparkContext.setLogLevel("WARN")
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    rocks.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    graft.Graft.registerFunctions(rocks) // topk_pairs on the NEW session's registry
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = rocks.sqlContext
    import rocks.implicits._

    val e = SimilarityQueries.vecsOf(corpus)
    val art = SimilarityQueries.rpqArtifactsOf(e, corpus.count())
    val fz = StreamingAnnTopK.freeze(art)
    val expected = batchPrefixTopK(art, e)
    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val cut = rows.size / 2
    // a batch-2 query must have batch-1 candidates in its top-k, or the
    // restart proves nothing (always true here: every prefix neighbor set
    // of a batch-2 arrival is dominated by batch-1 members)
    val batch1Ids = rows.take(cut).map(_._1).toSet
    assert(expected.exists { case (qi, xi, _) => !batch1Ids(qi) && batch1Ids(xi) },
      "spec setup drifted: no top-k pair crosses the restart boundary")

    val ckpt = java.nio.file.Files.createTempDirectory("graft-ann-ckpt").toString
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long, Double)]()
    val input = MemoryStream[(Long, Array[Float])]
    def start() = StreamingAnnTopK.topKCandidates(
        input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", fz, K)
      .toDF("qi", "xi", "asim").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add((r.getLong(0), r.getLong(1), r.getDouble(2)))); ()
      }
      .outputMode("update").option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      input.addData(rows.take(cut)); q1.processAllAvailable()
    } finally q1.stop() // the "crash": bucket state lives only in the checkpoint

    val q2 = start()
    try {
      input.addData(rows.drop(cut)); q2.processAllAvailable()
      val metrics = q2.lastProgress.stateOperators.flatMap(
        _.customMetrics.keySet().toArray.map(_.toString))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")))
    } finally q2.stop()
    // merge the per-bucket candidates accumulated ACROSS the restart
    import scala.jdk.CollectionConverters._
    val merged = StreamingAnnTopK.mergeTopK(
        got.asScala.toSeq.toDF("qi", "xi", "asim"), K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(merged === expected,
      s"restart lost bucket state: missing=${(expected -- merged).take(3)}")
  }

  test("state is the compressed scan tier: 16-byte codes, replay-safe inserts") {
    spark.sparkContext.setLogLevel("WARN")
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = SimilarityQueries.vecsOf(corpus)
    val art = SimilarityQueries.rpqArtifactsOf(e, corpus.count())
    val fz = StreamingAnnTopK.freeze(art)
    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1).take(100).toSeq

    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingAnnTopK.topKCandidates(
        input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", fz, K)
      .toDF("qi", "xi", "asim")
      .writeStream.format("memory").queryName("ann_gate_replay")
      .outputMode("update").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      val first = spark.table("ann_gate_replay").count()
      // a FULL replay of the same rows re-probes (emitting again — streams
      // cannot retract) but must not duplicate state: every re-probe pairs
      // against the same single copy of each member, so no self-pairs and
      // no (qi, xi) the first pass couldn't have emitted
      input.addData(rows)
      q.processAllAvailable()
      val after = spark.table("ann_gate_replay")
      assert(after.where(col("qi") === col("xi")).count() === 0L)
      val dup = after.groupBy("qi", "xi", "asim").count().where(col("count") > 2)
      assert(dup.count() === 0L, "a member was double-inserted into bucket state")
      assert(after.count() > first)
      // per-query progress snapshot: state rows = number of non-empty
      // buckets, bounded by the fine-centroid count
      val prog = q.lastProgress
      val stateRows = prog.stateOperators.apply(0).numRowsTotal
      assert(stateRows <= fz.fineIds.length,
        s"state rows $stateRows exceed bucket count ${fz.fineIds.length}")
    } finally q.stop()
  }
}
