package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingWheelIndex

/** Restart-survival walkthrough for a streaming wheel service: ingest the
  * events table as a file stream, publish plan-time rewrites, then persist
  * BOTH restart artifacts —
  *
  *   - `saveSnapshot` — the SERVED index in [[graft.index.WheelIndexIO]]'s
  *     format: any process loads it at start and answers queries at the
  *     saved watermark before any stream exists (no re-ingest, no special
  *     configuration — the file is self-describing), and
  *   - `saveState` — the INGEST state: an identically-configured publisher
  *     restores it and resumes append-merging where the old one stopped.
  *
  * The "restart" is simulated in-process: stop the stream, deregister (the
  * registry forgets the publisher — queries fall back to scans, shown),
  * load the snapshot (rewrites return, shown, with the pre-restart
  * answer), then restore + re-attach and watch a resumed batch land in a
  * NEW query's answer. Every step prints the optimized plan's evidence
  * (LocalRelation = served from wheels, relation scan = not).
  *
  * Run: `sbt "runMain graft.examples.SnapshotRestartExample [sfDir]"`
  */
object SnapshotRestartExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)

    graft.Tables.ensureNanosConf(spark)
    val tablePath = s"$sfDir/events.parquet"
    val all = graft.Tables.events(spark, sfDir).select("ts", "value")
    val work = java.nio.file.Files.createTempDirectory("graft-snap-ex").toString
    val inDir = s"$work/in"
    // two staged files = two micro-batches; the second lands AFTER the
    // simulated restart to show resumed ingest
    val Array(first, second) = all.randomSplit(Array(0.5, 0.5), seed = 7)
    first.repartition(1).write.parquet(inDir)

    def serveEvidence(tag: String): Unit = {
      val df = spark.sql(
        s"""SELECT count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
           |FROM parquet.`$tablePath`
           |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
           |  AND ts < TIMESTAMP '2024-01-12 00:00:00'""".stripMargin)
      val opt = df.queryExecution.optimizedPlan
      val served = opt.collect {
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => ()
      }.nonEmpty
      println(s"[$tag] served-from-wheels=$served  answer=${df.collect().mkString}")
    }

    // ---- session 1: ingest, register, persist, "crash" ------------------
    val idx = new StreamingWheelIndex("ts", Some("value"))
    val stream = spark.readStream.schema(first.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = idx.attach(stream, "snap-ex-1")
    idx.register(tablePath)
    q.processAllAvailable()
    serveEvidence("live stream")
    idx.saveSnapshot(s"$work/idx.snapshot")
    idx.saveState(s"$work/idx.state")
    q.stop()
    idx.deregister()
    serveEvidence("after crash (registry lost)") // falls back to the scan

    // ---- session 2 phase A: load the snapshot AT START ------------------
    val (_, fresh) = graft.index.WheelIndexIO.load(spark, s"$work/idx.snapshot")
    println(s"[loaded snapshot] fresh=$fresh (watermark-consistent)")
    serveEvidence("snapshot only") // pre-restart watermark answer, no stream

    // ---- phase B: restore ingest state and resume the stream ------------
    // restoreState merges additively, so the resumed SOURCE must deliver
    // only rows the old session never ingested (in production the source's
    // own checkpointLocation guarantees that; here the new half lands in a
    // fresh directory so the new file stream cannot replay file 1)
    val idx2 = new StreamingWheelIndex("ts", Some("value"))
    val wmMs = idx2.restoreState(s"$work/idx.state")
    println(s"[restored state] resume after watermark ${java.time.Instant.ofEpochMilli(wmMs)}")
    val inDir2 = s"$work/in2"
    second.repartition(1).write.parquet(inDir2)
    val stream2 = spark.readStream.schema(first.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir2)
    val q2 = idx2.attach(stream2, "snap-ex-2")
    idx2.register(tablePath)
    q2.processAllAvailable()
    serveEvidence("resumed stream") // restored history + the second half

    q2.stop()
    idx2.deregister()
    graft.index.WheelRegistry.deregister(tablePath)
    spark.stop()
  }
}
