package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Production state-store run of both streaming gates (round-13 task 5):
  * the default HDFSBackedStateStoreProvider keeps every state row on the
  * executor HEAP — at 100 TB key cardinality that is an OOM class even
  * with `idleEvict`. The recommended production config is the RocksDB
  * provider, which spills state to local disk with bounded block-cache
  * memory:
  *
  * {{{
  * spark.sql.streaming.stateStore.providerClass =
  *   org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
  * spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled = true
  * }}}
  *
  * Both gate specs' core scenarios must stay green under it — same emitted
  * pairs/verdicts as the default provider (the gates' logic is
  * provider-agnostic `flatMapGroupsWithState`; this pins that no
  * serialization or timeout behavior diverges). The spec runs on a
  * `newSession()` so the provider conf never leaks into sibling suites.
  */
class RocksDbStateStoreSpec extends AnyFunSuite {

  private lazy val base: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Same SparkContext, isolated SQLConf carrying the RocksDB provider —
    * WITH changelog checkpointing, the production config the operator
    * scaladocs recommend (per-batch uploads are the delta changelog, not a
    * full SST snapshot; the restart tests below exercise restore through
    * that path). */
  private lazy val spark: SparkSession = {
    base.sparkContext.setLogLevel("WARN")
    val s = base.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    s
  }

  private val sf = "/root/testdata/sf0.001"

  private def assertRocksDb(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val metrics = q.lastProgress.stateOperators.flatMap(
      _.customMetrics.keySet().toArray.map(_.toString))
    assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
      s"query did not run on the RocksDB provider (metrics: ${metrics.mkString(",")})")
  }

  test("near-dup gate: streamed candidates equal the batch banded set under RocksDB") {
    graft.Graft.registerFunctions(spark)
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val all = docs.as[(Long, String)].collect().toSeq
    val expected = graft.queries.SimilarityQueries.bandedCandidates(
        StreamingNearDup.bandKeys(docs, "doc_id", "text"), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)

    val input = MemoryStream[(Long, String)]
    val pairs = StreamingNearDup.candidates(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = pairs.toDF("i", "j").writeStream
      .format("memory").queryName("rocks_near_dup").outputMode("update").start()
    try {
      input.addData(all.take(120))
      q.processAllAvailable()
      input.addData(all.drop(120))
      q.processAllAvailable()
      assertRocksDb(q)
      val got = spark.table("rocks_near_dup")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    } finally q.stop()
  }

  test("exact-dedup gate: group structure matches batch dd_exact under RocksDB") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batchGroups = docs
      .select(md5(substring(col("text"), 1, 30)).as("k"), col("doc_id"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).values.toSet
    val all = docs.as[(Long, String)].collect().sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val gate = StreamingExactDedup.verdicts(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = gate.toDF("doc_id", "rep_id", "is_dup").writeStream
      .format("memory").queryName("rocks_exact").outputMode("update").start()
    try {
      input.addData(all.take(130))
      q.processAllAvailable()
      input.addData(all.drop(130))
      q.processAllAvailable()
      assertRocksDb(q)
      val got = spark.table("rocks_exact")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(got.length === all.length)
      val gotGroups = got.groupBy(_._2).map { case (rep, rows) =>
        rows.map(_._1).toSet + rep
      }.toSet
      assert(gotGroups === batchGroups)
    } finally q.stop()
  }

  // --- restart-restore (round-14 verdict task 5) ---------------------------
  // The single-continuous-run tests above prove the provider SERVES; these
  // prove it RESTORES: the stream dies after the first batch's commit, a
  // fresh query restarts from the RocksDB+changelog checkpoint, and the
  // batch-2 verdicts must equal a never-restarted twin's — which only
  // happens if the per-(band,bucket) / per-content-key state actually came
  // back (lost state would silently drop every cross-batch pair/dup). The
  // sink is foreachBatch into a shared buffer (the memory sink refuses
  // checkpoint recovery); the CROSS-batch outputs are the restore evidence.

  test("near-dup gate: candidates survive a kill + restart from the checkpoint") {
    graft.Graft.registerFunctions(spark)
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    // never-restarted truth: the batch banded set (the continuous-run test
    // above already pins streamed == batch, so this IS the twin's output)
    val expected = graft.queries.SimilarityQueries.bandedCandidates(
        StreamingNearDup.bandKeys(docs, "doc_id", "text"), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the split must place near-dup pairs on BOTH sides of the restart or
    // the test proves nothing — pairs within batch 1 alone can't miss
    val cut = 120
    val batch1Ids = all.take(cut).map(_._1).toSet
    assert(expected.exists { case (i, j) => batch1Ids(i) != batch1Ids(j) },
      "spec setup drifted: no candidate pair crosses the restart boundary")

    val ckpt = java.nio.file.Files.createTempDirectory("graft-rocks-ckpt-nd").toString
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long)]()
    val input = MemoryStream[(Long, String)]
    def start() = StreamingNearDup.candidates(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .toDF("i", "j").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add((r.getLong(0), r.getLong(1)))); ()
      }
      .outputMode("update").option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      input.addData(all.take(cut))
      q1.processAllAvailable()
      assertRocksDb(q1)
    } finally q1.stop() // the "crash": state lives only in the checkpoint now

    val q2 = start()
    try {
      input.addData(all.drop(cut))
      q2.processAllAvailable()
      assertRocksDb(q2)
      import scala.jdk.CollectionConverters._
      val gotSet = got.asScala.toSet
      assert(gotSet === expected,
        s"restart lost state: missing=${(expected -- gotSet).take(5)} extra=${(gotSet -- expected).take(5)}")
    } finally q2.stop()
  }

  test("exact-dedup gate: group structure survives a kill + restart from the checkpoint") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batchGroups = docs
      .select(md5(substring(col("text"), 1, 30)).as("k"), col("doc_id"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).values.toSet
    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val cut = 130
    // a dup group spanning the cut is the restore evidence (see above)
    assert(batchGroups.exists(g => g.exists(_ < all(cut)._1) && g.exists(_ >= all(cut)._1)),
      "spec setup drifted: no dup group crosses the restart boundary")

    val ckpt = java.nio.file.Files.createTempDirectory("graft-rocks-ckpt-xd").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Boolean)]()
    val input = MemoryStream[(Long, String)]
    def start() = StreamingExactDedup.verdicts(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .toDF("doc_id", "rep_id", "is_dup").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          got.add((r.getLong(0), r.getLong(1), r.getBoolean(2)))); ()
      }
      .outputMode("update").option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      input.addData(all.take(cut))
      q1.processAllAvailable()
      assertRocksDb(q1)
    } finally q1.stop()

    val q2 = start()
    try {
      input.addData(all.drop(cut))
      q2.processAllAvailable()
      assertRocksDb(q2)
      import scala.jdk.CollectionConverters._
      val rows = got.asScala.toVector
      assert(rows.length === all.length,
        s"restart dropped/duplicated verdicts: ${rows.length} vs ${all.length}")
      val gotGroups = rows.groupBy(_._2).map { case (rep, rs) =>
        rs.map(_._1).toSet + rep
      }.toSet
      assert(gotGroups === batchGroups,
        "restart lost dedup state: a batch-2 duplicate did not resolve to its batch-1 representative")
    } finally q2.stop()
  }
}
