package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{functions => F}

import graft.index.{IndexedWheel, TableIndex, WheelRegistry}
import graft.wheel.{HawWheel, RwWheel}

/** Per-batch accumulator: a partial wheel plus the value-quality counters
  * the fused batch build tracks in [[graft.index.WheelBuildAcc]].
  * Top-level (no outer pointer) so executors serialize only slot payloads
  * as it tree-merges. */
private[streaming] final class BatchAcc(val wheel: RwWheel) extends Serializable {
  var nullV = 0L
  var nanV = 0L
  var badRep = 0L
  def merge(o: BatchAcc): BatchAcc = {
    wheel.merge(o.wheel)
    nullV += o.nullV; nanV += o.nanV; badRep += o.badRep
    this
  }
}

/** Continuously-maintained wheel index over a Structured Streaming source —
  * the streaming half of µWheel that the reference leaves unexposed (its
  * `RwWheel` has watermark + write-ahead inserts, `advance_to` progression —
  * `/root/reference/datafusion-uwheel/src/lib.rs:1005-1010,1075-1080` — but
  * datafusion-uwheel only ever builds indices once from a static table).
  *
  * Spark-first design: each micro-batch reduces to *per-second partial
  * aggregates* by a distributed map-side-combining groupBy, which fold into
  * per-partition [[RwWheel]]s and tree-merge ON THE EXECUTORS — the driver
  * receives ONE wheel per batch (the same no-driver-collect shape as the
  * batch build and [[StreamingTypedWheel]]), so ingest cost at the driver is
  * bounded by the batch's distinct active seconds in ONE compact payload,
  * never a Row per second: a single batch replaying months of history is a
  * handful of serialized slot maps, not millions of collected rows. Late
  * data is governed by the upstream watermark (`withWatermark` on the
  * source); whatever the watermark admits, the wheel merges exactly.
  *
  * Readers call [[snapshot]] for an immutable [[HawWheel]] (freeze-on-read,
  * the reference's `ReaderWheel` conversion) and query `range`/`groupBy`/
  * `landmark` on it — or [[register]] the wheel under a table path so batch
  * SQL rewrites answer from it at plan time.
  */
final class StreamingWheelIndex(
    timeColumn: String,
    valueColumn: Option[String],
    scale: Int = 2,
    /** Snapshot slot span in seconds (1, 60, 3600 or 86400): long-running
      * ingest over months of event time can coarsen its read-side wheels
      * the same way batch builds do (`UWheelBuilder.withSlotSpan`) — the
      * per-second ingest state is unchanged; only [[snapshot]] compacts. */
    slotSpanSec: Long = 1L) {
  require(graft.wheel.HawWheel.AllowedSlotSpans.contains(slotSpanSec),
    s"slot span must be one of ${graft.wheel.HawWheel.AllowedSlotSpans.mkString(", ")} s")

  private val rw = new RwWheel(scale, valueColumn.isDefined)
  private val cached = new AtomicReference[(Long, HawWheel)]((0L, null))
  private var version = 0L
  // value-quality flags accumulated across batches — the streaming analogue
  // of the batch build's exactness/NaN/NULL probes, gating which rewrite
  // kinds a REGISTERED wheel may serve (all false until data says otherwise)
  private var sawNullValue = false
  private var sawNaN = false
  private var sawBadRep = false
  @volatile private var publishKey: Option[String] = None

  def watermarkMs: Long = rw.synchronized(rw.watermark)

  /** Partials dropped by the write-ahead horizon. The ATTACHED stream path
    * never trips it: each batch merges through the trusted build path
    * (lateness is the upstream watermark's job) with the wheel watermark
    * advanced past the batch afterwards, so arbitrarily large in-order
    * replays land whole. The horizon remains binding for DIRECT
    * `tryMergePartial` callers feeding unsorted cross-batch partials,
    * where it bounds memory instead of failing the stream. */
  def droppedBeyondHorizon: Long = rw.synchronized(rw.droppedBeyondHorizon)

  /** Immutable point-in-time view; cheap when no batch arrived since the
    * last call. */
  def snapshot(): HawWheel = {
    val (v, hw) = cached.get()
    val cur = rw.synchronized(version)
    if (hw != null && v == cur) hw
    else {
      val fresh = rw.synchronized((version, rw.freeze(slotSpanSec)))
      // install only if strictly fresher (same race as StreamingTypedWheel:
      // two concurrent freezers must not let the staler pair win the cache)
      var installed = false
      while (!installed) {
        val seen = cached.get()
        val stale = seen._2 != null && fresh._1 <= seen._1
        installed = stale || cached.compareAndSet(seen, fresh)
      }
      fresh._2
    }
  }

  /** Publishes freeze-on-read snapshots of this wheel into the optimizer's
    * [[WheelRegistry]] under `path`'s key, re-published after every batch
    * (swap-on-version: the registry always holds a consistent immutable
    * snapshot; staleness is the stream's version, not a file listing — the
    * published index carries fingerprint 0, which skips the batch-build
    * listing gate). From then on BATCH SQL over the parquet table at
    * `path` rewrites at plan time from the stream-maintained wheel.
    *
    * Contract: the caller asserts this stream IS the feed of the table at
    * `path` — the rewrite answers with the wheel's watermark-consistent
    * state, which is exactly the rows the stream has admitted (files the
    * stream hasn't delivered yet, or rows a sink hasn't committed, are not
    * in the answer). Unbounded-time arms stay on the scan (the stream
    * cannot prove the table's time column NULL-free: ingest filters NULL
    * times out). */
  def register(path: String): Unit = {
    publishKey = Some(WheelRegistry.normalizePath(path))
    rw.synchronized(publishLocked())
  }

  /** Withdraws the published index; batch SQL falls back to scans. */
  def deregister(): Unit = {
    publishKey.foreach(WheelRegistry.deregister)
    publishKey = None
  }

  /** Must hold `rw`'s lock. snapshot() re-enters it (reentrant). */
  private def publishLocked(): Unit = publishKey.foreach { key =>
    val hw = snapshot()
    val t = new TableIndex(key, timeColumn, tsAllNonNull = false, 0L)
    valueColumn.foreach { vc =>
      t.put(IndexedWheel(hw, Some(vc), "",
        valueAllNonNull = !sawNullValue,
        valuesExactAtScale = !sawBadRep,
        valuesNaNFree = !sawNaN))
    }
    t.put(IndexedWheel(hw, None, "", valueAllNonNull = true)) // count wheel shares hw
    WheelRegistry.register(t)
  }

  /** Starts the maintenance query on a streaming DataFrame. The time column
    * takes every type the batch build takes, via the same conversion
    * ([[graft.index.UWheelIndex.secExprOf]]): TIMESTAMP, raw-nanos LONG,
    * DATE (days × 86400 s, zone-free), and TIMESTAMP_NTZ. */
  def attach(stream: DataFrame, queryName: String): StreamingQuery = {
    val secExpr = graft.index.UWheelIndex.secExprOf(stream, timeColumn)
    stream.writeStream
      .queryName(queryName)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val projected = valueColumn match {
          case Some(vc) => batch.select(secExpr.as("__sec"), F.col(vc).cast("double").as("__v"))
          case None     => batch.select(secExpr.as("__sec"), F.lit(null).cast("double").as("__v"))
        }
        val v = F.col("__v")
        // same exactness probe as the batch build: does the value survive a
        // DECIMAL(38,scale) round-trip? (try_cast keeps ANSI mode non-fatal)
        val roundTrip = v.try_cast(s"decimal(38,$scale)").cast("double")
        val partials = projected
          .where(F.col("__sec").isNotNull)
          .groupBy("__sec")
          .agg(
            F.count(F.lit(1)).as("c"),
            F.sum(v.cast(DecimalType(38, scale))).as("s"),
            F.min(v).as("mn"),
            F.max(v).as("mx"),
            F.sum(F.when(v.isNull, F.lit(1L)).otherwise(F.lit(0L))).as("nullv"),
            F.sum(F.when(F.isnan(v), F.lit(1L)).otherwise(F.lit(0L))).as("nanv"),
            F.sum(F.when(v.isNotNull && (roundTrip.isNull || roundTrip =!= v), F.lit(1L))
              .otherwise(F.lit(0L))).as("bad"))
        val rdd = partials.rdd
        val hasVals = valueColumn.isDefined
        val localScale = scale // closure must not capture `this`
        val acc =
          if (rdd.getNumPartitions == 0) new BatchAcc(new RwWheel(localScale, hasVals))
          else rdd.treeAggregate(new BatchAcc(new RwWheel(localScale, hasVals)))(
            (a, r) => {
              val sumScaled =
                if (r.isNullAt(2)) 0L
                else r.getDecimal(2).movePointRight(localScale).longValueExact()
              val mn = if (r.isNullAt(3)) Double.PositiveInfinity else r.getDouble(3)
              val mx = if (r.isNullAt(4)) Double.NegativeInfinity else r.getDouble(4)
              a.wheel.mergePartial(r.getLong(0), r.getLong(1), sumScaled, mn, mx)
              a.nullV += r.getLong(5); a.nanV += r.getLong(6); a.badRep += r.getLong(7)
              a
            },
            (a, b) => a.merge(b),
            depth = 2)
        rw.synchronized {
          // trusted merge (the distributed-build path): cross-batch lateness
          // is the upstream watermark's contract, so an arbitrarily large
          // in-order replay merges whole; afterwards the wheel watermark
          // advances past the batch's newest slot, exactly as the previous
          // per-partial ascending merge ended up
          rw.merge(acc.wheel)
          if (acc.wheel.newestSlotSec != Long.MinValue)
            rw.advanceTo((acc.wheel.newestSlotSec + 1) * 1000L)
          if (acc.nullV > 0) sawNullValue = true
          if (acc.nanV > 0) sawNaN = true
          if (acc.badRep > 0) sawBadRep = true
          version += 1
          publishLocked()
        }
        ()
      }
      .start()
  }
}
