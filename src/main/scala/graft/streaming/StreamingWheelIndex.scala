package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{functions => F}

import graft.wheel.{HawWheel, RwWheel}

/** Continuously-maintained wheel index over a Structured Streaming source —
  * the streaming half of µWheel that the reference leaves unexposed (its
  * `RwWheel` has watermark + write-ahead inserts, `advance_to` progression —
  * `/root/reference/datafusion-uwheel/src/lib.rs:1005-1010,1075-1080` — but
  * datafusion-uwheel only ever builds indices once from a static table).
  *
  * Spark-first design: each micro-batch is reduced to *per-second partial
  * aggregates* by a distributed map-side-combining groupBy — the driver
  * merges one row per distinct second per batch, so ingest cost is bounded
  * by the batch's time span, not its row count (same property that makes the
  * batch build viable at 100 TB). Late data is governed by the upstream
  * watermark (`withWatermark` on the source); whatever the watermark admits,
  * the wheel merges exactly.
  *
  * Readers call [[snapshot]] for an immutable [[HawWheel]] (freeze-on-read,
  * the reference's `ReaderWheel` conversion) and query `range`/`groupBy`/
  * `landmark` on it.
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

  def watermarkMs: Long = rw.synchronized(rw.watermark)

  /** Partials dropped by the write-ahead horizon. The ATTACHED stream path
    * never trips it: each batch is merged in ascending event-time order
    * with the watermark advancing alongside, so arbitrarily large in-order
    * replays land whole — within a batch the source's event times are
    * trusted (a far-future timestamp is merged, exactly as the upstream
    * engine itself would window it; there is no general way to tell
    * corruption from a genuine replay gap). The horizon remains binding for
    * DIRECT `tryMergePartial` callers feeding unsorted cross-batch
    * partials, where it bounds memory instead of failing the stream. */
  def droppedBeyondHorizon: Long = rw.synchronized(rw.droppedBeyondHorizon)

  /** Immutable point-in-time view; cheap when no batch arrived since the
    * last call. */
  def snapshot(): HawWheel = {
    val (v, hw) = cached.get()
    val cur = rw.synchronized(version)
    if (hw != null && v == cur) hw
    else {
      val fresh = rw.synchronized((version, rw.freeze(slotSpanSec)))
      cached.set(fresh)
      fresh._2
    }
  }

  /** Starts the maintenance query on a streaming DataFrame. The time column
    * takes every type the batch build takes, via the same conversion
    * ([[graft.index.UWheelIndex.secExprOf]]): TIMESTAMP, raw-nanos LONG,
    * DATE (days × 86400 s, zone-free — a DATE stream previously fell into
    * the generic `cast(long)` arm, which is not a valid cast for DateType),
    * and TIMESTAMP_NTZ. */
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
        val partials = projected
          .where(F.col("__sec").isNotNull)
          .groupBy("__sec")
          .agg(
            F.count(F.lit(1)).as("c"),
            F.sum(F.col("__v").cast(DecimalType(38, scale))).as("s"),
            F.min("__v").as("mn"),
            F.max("__v").as("mx"))
          .collect()
        rw.synchronized {
          // ascending order, advancing the watermark ALONG the batch: a
          // single batch replaying weeks of history merges whole (round-3
          // advice — the previous anchor-at-earliest-second horizon silently
          // dropped the tail of any batch spanning > writeAheadSlots).
          // Lateness is governed by the upstream Spark watermark, as the
          // class doc states; the wheel-side horizon remains only as a guard
          // for direct, unsorted tryMergePartial callers.
          var last = Long.MinValue
          partials.sortBy(_.getLong(0)).foreach { r =>
            val sec = r.getLong(0)
            val sumScaled =
              if (r.isNullAt(2)) 0L
              else r.getDecimal(2).movePointRight(scale).longValueExact()
            val mn = if (r.isNullAt(3)) Double.PositiveInfinity else r.getDouble(3)
            val mx = if (r.isNullAt(4)) Double.NegativeInfinity else r.getDouble(4)
            rw.advanceTo(sec * 1000L)
            if (rw.tryMergePartial(sec, r.getLong(1), sumScaled, mn, mx)) last = sec
          }
          if (last != Long.MinValue) rw.advanceTo((last + 1) * 1000L)
          version += 1
        }
        ()
      }
      .start()
  }
}
