package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingNearDup

/** Ingest-time near-duplicate gating — the streaming complement of the
  * batch dedup operators: documents arrive in micro-batches, and the gate
  * flags each one the moment any of its MinHash band keys collides with an
  * already-ingested document's. An ingest pipeline drops (or queues for
  * verification) flagged arrivals instead of re-sweeping the corpus.
  *
  * The demo streams the synthetic corpus in three uneven chunks and shows
  * (a) candidate pairs appearing as soon as BOTH members have arrived,
  * never earlier, and (b) the final pair set matching the batch LSH
  * operator's candidate stage — the parity `StreamingNearDupSpec` pins.
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

    def flagged(): Long = spark.table("ingest_gate").distinct().count()
    Seq(docs.take(200), docs.slice(200, 350), docs.drop(350)).zipWithIndex
      .foreach { case (chunk, k) =>
        input.addData(chunk)
        q.processAllAvailable()
        println(s"after micro-batch ${k + 1} (${chunk.size} docs): ${flagged()} flagged pairs")
      }
    q.stop()

    val finalPairs = spark.table("ingest_gate").distinct()
      .orderBy("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"gate total: ${finalPairs.length} candidate pairs; first 5: " +
      finalPairs.take(5).mkString(", "))
    spark.stop()
  }
}
