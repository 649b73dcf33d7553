package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming exact-dedup gate must (a) group exactly like the batch
  * `dd_exact` key — same groups, same member sets, one representative
  * drawn from inside each group (groupByKey guarantees no intra-batch
  * order, so WHICH member is first-arrived is not assertable; the group
  * structure is), (b) be invariant to micro-batch chopping, and (c)
  * re-emit idempotent verdicts on replay. */
class StreamingExactDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("streamed verdicts reproduce the batch dd_exact group structure") {
    spark.sparkContext.setLogLevel("WARN")
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    // batch truth: the dd_exact contract key → its full member set
    val batchGroups = docs
      .select(md5(substring(col("text"), 1, 30)).as("k"), col("doc_id"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).values.toSet
    assert(batchGroups.exists(_.size > 1), "corpus has no exact-prefix dup groups?")

    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val input = MemoryStream[(Long, String)]
    val gate = StreamingExactDedup.verdicts(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = gate.toDF("doc_id", "rep_id", "is_dup").writeStream
      .format("memory").queryName("exact_gate").outputMode("update").start()
    try {
      // uneven chops: the group structure must not depend on batching
      input.addData(all.take(150))
      q.processAllAvailable()
      input.addData(all.slice(150, 170))
      q.processAllAvailable()
      input.addData(all.drop(170))
      q.processAllAvailable()
      val got = spark.table("exact_gate")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(got.length === all.length) // one verdict per document
      // streamed groups (rows sharing a rep) == batch groups, member for
      // member; the rep is inside its own group by construction
      val gotGroups = got.groupBy(_._2).map { case (rep, rows) =>
        rows.map(_._1).toSet + rep
      }.toSet
      assert(gotGroups === batchGroups)
      // is_dup is exactly "not the representative"; one keeper per group
      assert(got.forall { case (id, rep, dup) => dup === (id != rep) })
      assert(got.count(!_._3) === batchGroups.size)
    } finally q.stop()
  }

  test("replay re-emits the original verdict (idempotent mapping)") {
    spark.sparkContext.setLogLevel("WARN")
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val gate = StreamingExactDedup.verdicts(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = gate.toDF("doc_id", "rep_id", "is_dup").writeStream
      .format("memory").queryName("exact_gate_replay").outputMode("update").start()
    try {
      val doc1 = (1L, "the same exact text prefix padded well beyond thirty chars")
      val doc2 = (2L, "the same exact text prefix padded well beyond thirty chars")
      input.addData(doc1, doc2)
      q.processAllAvailable()
      input.addData(doc2) // at-least-once redelivery
      q.processAllAvailable()
      val got = spark.table("exact_gate_replay")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      // doc2's verdict is the same both times: dup of 1
      assert(got.toSet === Set((1L, 1L, false), (2L, 1L, true)))
      assert(got.count(_ == ((2L, 1L, true))) === 2) // emitted once per delivery
    } finally q.stop()
  }
}
