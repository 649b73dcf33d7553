package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingWheelIndex

/** Streaming-maintenance walkthrough: replay the events table as a file
  * stream (four part-files, one per micro-batch — the shape of a
  * continuously-landing ingest directory), let [[StreamingWheelIndex]]
  * fold each micro-batch's per-second partials into the live wheel, and
  * check the frozen snapshot against the batch ground truth. The wheel
  * answers range/landmark aggregates DURING ingestion with no re-scan —
  * the reference's RwWheel `insert`/`advance_to` loop
  * (`lib.rs:1005-1010`), fed by Structured Streaming instead of a
  * single-process iterator.
  *
  * Run: `sbt "runMain graft.examples.StreamingExample [sfDir]"`
  */
object StreamingExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the corpus as a streaming source directory
    graft.Tables.ensureNanosConf(spark)
    val all = graft.Tables.events(spark, sfDir).select("ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ex").toString + "/in"
    all.repartition(4).write.parquet(dir)

    val stream = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", 1) // one part-file per micro-batch
      .parquet(dir)
    val idx = new StreamingWheelIndex("ts", Some("value"))
    val q = idx.attach(stream, "wheel-maintenance-example")
    q.processAllAvailable()
    q.stop()

    val w = idx.snapshot()
    val lm = w.landmark
    val truth = all.agg(count(lit(1)), sum(col("value").cast("decimal(38,2)"))).head()
    println(s"streamed rows: ${lm.count} (batch ground truth ${truth.getLong(0)})")
    println(s"streamed sum:  ${lm.sumDecimal.get} (batch ${truth.getDecimal(1)})")
    val aligned = w.startSec + 3600 - Math.floorMod(w.startSec, 3600L)
    val r = w.range(aligned, aligned + 86400)
    println(s"one-day range [${aligned}, +86400): count=${r.count} sum=${r.sumDecimal.orNull}")
    assert(lm.count == truth.getLong(0), "count mismatch")
    assert(lm.sumDecimal.get.compareTo(truth.getDecimal(1)) == 0, "sum mismatch")
    println("snapshot ≡ batch ground truth")
    spark.stop()
  }
}
