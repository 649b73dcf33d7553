package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingExactDedup, StreamingNearDup}

/** Ingest-time duplicate gating — the streaming complement of the batch
  * dedup operators, BOTH tiers: the EXACT gate decides hash-key duplicates
  * per arriving document with zero false positives (`(doc_id, rep_id,
  * is_dup)` verdicts — the online keep-set is `!is_dup`), and the NEAR-DUP
  * gate flags a document the moment any of its MinHash band keys collides
  * with an already-ingested document's. An ingest pipeline drops exact
  * dups immediately and queues near-dup candidates for verification,
  * instead of re-sweeping the corpus.
  *
  * The demo streams the synthetic corpus in three uneven chunks and shows
  * (a) exact verdicts per chunk (keepers vs dups so far), (b) candidate
  * pairs appearing as soon as BOTH members have arrived, never earlier,
  * and (c) the final sets matching the batch operators — the parities
  * `StreamingExactDedupSpec` / `StreamingNearDupSpec` pin.
  *
  * Run: `sbt "runMain graft.examples.IngestGateExample"`
  */
object IngestGateExample {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.registerFunctions(spark)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq

    val input = MemoryStream[(Long, String)]
    val gate = StreamingNearDup.candidates(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = gate.toDF("i", "j").writeStream
      .format("memory").queryName("ingest_gate").outputMode("update").start()
    val exactIn = MemoryStream[(Long, String)]
    val exact = StreamingExactDedup.verdicts(
      exactIn.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val qe = exact.toDF("doc_id", "rep_id", "is_dup").writeStream
      .format("memory").queryName("exact_gate").outputMode("update").start()

    def flagged(): Long = spark.table("ingest_gate").distinct().count()
    def exactDups(): Long = spark.table("exact_gate").where(col("is_dup")).count()
    Seq(docs.take(200), docs.slice(200, 350), docs.drop(350)).zipWithIndex
      .foreach { case (chunk, k) =>
        input.addData(chunk)
        exactIn.addData(chunk)
        q.processAllAvailable()
        qe.processAllAvailable()
        println(s"after micro-batch ${k + 1} (${chunk.size} docs): " +
          s"${exactDups()} exact dups dropped, ${flagged()} near-dup pairs flagged")
      }
    q.stop()
    qe.stop()

    // the exact gate's keep-set groups match the batch dd_exact key
    val batchGroups = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .groupBy(md5(substring(col("text"), 1, 30))).count()
      .where(col("count") > 1).count()
    val streamedDupGroups = spark.table("exact_gate").where(col("is_dup"))
      .select("rep_id").distinct().count()
    println(s"exact-dup groups: streamed $streamedDupGroups vs batch $batchGroups")

    val finalPairs = spark.table("ingest_gate").distinct()
      .orderBy("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"gate total: ${finalPairs.length} candidate pairs; first 5: " +
      finalPairs.take(5).mkString(", "))
    spark.stop()
  }
}
