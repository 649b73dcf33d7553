package graft.index

import scala.reflect.ClassTag

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col

import graft.wheel.{TypedHawWheel, TypedRwWheel, WheelAggregator}

/** Distributed build of a TYPED wheel over a DataFrame — the same
  * no-driver-collect shape as the fused index build
  * ([[graft.index.WheelBuildAcc]]): executors fold their partitions into
  * per-partition [[TypedRwWheel]]s, which merge in a depth-2 tree so the
  * driver receives ONE wheel whose payload is bounded by
  * (active slots) × (partial size), never by row count.
  *
  * This is what makes sketch aggregators usable at corpus scale: an
  * [[graft.wheel.WheelAggregators.HllDistinct]] partial is a fixed 2^p
  * bytes, so "distinct users over any time range" over 100 TB of events
  * merges down to active-seconds × 2 KiB regardless of cardinality —
  * the aggregate no exact wheel can carry (reference aggregator surface:
  * `/root/reference/datafusion-uwheel/src/aggregator/mod.rs:8-34`).
  *
  * The time column takes every type the fused build takes (TIMESTAMP,
  * TIMESTAMP_NTZ, DATE, raw-nanos LONG) via the same zone-free conversion.
  */
object TypedWheelBuild {

  /** Builds a frozen typed wheel from `df`.
    *
    * @param valueCol the aggregated input column
    * @param readIn   reads the input value from a (sec, value) row —
    *                 e.g. `_.getLong(1)` for a LONG column
    */
  def build[In, P: ClassTag, Out](
      df: DataFrame,
      timeColumn: String,
      valueCol: Column,
      agg: WheelAggregator[In, P, Out],
      readIn: Row => In): TypedHawWheel[P, Out] =
    buildRw(df, timeColumn, valueCol, agg, readIn).freeze()

  /** [[build]] plus a count of the rows it SKIPPED for a NULL aggregate
    * value (time non-NULL, value NULL) — the fact the heavy-hitter
    * optimizer rewrite needs: a `GROUP BY key` query has a NULL group the
    * wheel cannot represent, so the rule serves only when this count is 0.
    * Counted by an accumulator inside the same pass (no extra scan);
    * accumulator updates in transformations may double-count under task
    * retries, which can only OVERstate the count — the consumer then
    * declines a rewrite it could have served, never serves a wrong one. */
  def buildCounted[In, P: ClassTag, Out](
      df: DataFrame,
      timeColumn: String,
      valueCol: Column,
      agg: WheelAggregator[In, P, Out],
      readIn: Row => In): (TypedHawWheel[P, Out], Long) = {
    val (w, nulls) = buildRwCounted(df, timeColumn, valueCol, agg, readIn)
    (w.freeze(), nulls)
  }

  /** [[buildRw]] plus the skipped-NULL-value count — same single pass, for
    * callers that keep merging (the streaming top-talkers publisher folds
    * one of these per micro-batch and accumulates the NULL-key gate,
    * instead of paying a second count() action over the batch). */
  def buildRwCounted[In, P: ClassTag, Out](
      df: DataFrame,
      timeColumn: String,
      valueCol: Column,
      agg: WheelAggregator[In, P, Out],
      readIn: Row => In): (TypedRwWheel[In, P, Out], Long) = {
    val sec = UWheelIndex.secExprOf(df, timeColumn)
    val rows = df.select(sec.as("__sec"), valueCol.as("__v"))
      .where(col("__sec").isNotNull)
    val nullValues = df.sparkSession.sparkContext.longAccumulator("graft.nullAggValues")
    val rdd = rows.rdd
    if (rdd.getNumPartitions == 0) return (new TypedRwWheel(agg), 0L)
    val w = rdd
      .mapPartitions { it =>
        val w = new TypedRwWheel(agg)
        it.foreach { r =>
          if (r.isNullAt(1)) nullValues.add(1L)
          else w.mergeLift(r.getLong(0), readIn(r))
        }
        Iterator.single(w)
      }
      .treeReduce((a, b) => a.merge(b), depth = 2)
    (w, nullValues.value)
  }

  /** The pre-freeze ingest wheel — for callers that keep merging (the
    * streaming maintenance path merges one of these per micro-batch into
    * its live wheel). */
  def buildRw[In, P: ClassTag, Out](
      df: DataFrame,
      timeColumn: String,
      valueCol: Column,
      agg: WheelAggregator[In, P, Out],
      readIn: Row => In): TypedRwWheel[In, P, Out] = {
    val sec = UWheelIndex.secExprOf(df, timeColumn)
    // NULL discipline matches SQL aggregates (and the fused build): rows
    // with a NULL time OR a NULL aggregate value are skipped — a readIn
    // like `_.getLong(1)` would otherwise throw on the first NULL value
    val rows = df.select(sec.as("__sec"), valueCol.as("__v"))
      .where(col("__sec").isNotNull && col("__v").isNotNull)
    val rdd = rows.rdd
    if (rdd.getNumPartitions == 0) return new TypedRwWheel(agg)
    rdd
      .mapPartitions { it =>
        val w = new TypedRwWheel(agg)
        it.foreach(r => w.mergeLift(r.getLong(0), readIn(r)))
        Iterator.single(w)
      }
      // depth 2: executor-side pre-merge, one wheel to the driver
      .treeReduce((a, b) => a.merge(b), depth = 2)
  }
}
