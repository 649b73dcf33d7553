package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import scala.reflect.ClassTag

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.index.{DistinctIndexedWheel, FreqIndexedWheel, MomentIndexedWheel, QuantileIndexedWheel, TableIndex, TopKIndexedWheel, TypedWheelBuild, WheelRegistry}
import graft.wheel.{TypedHawWheel, TypedRwWheel, WheelAggregator, WheelAggregators}

/** Continuously-maintained TYPED wheel over a Structured Streaming source —
  * the custom-aggregator counterpart of [[StreamingWheelIndex]]. Each
  * micro-batch runs the distributed typed build ([[TypedWheelBuild]]):
  * executors fold their partitions into per-partition wheels that
  * tree-merge, and the driver merges ONE wheel per batch into the live
  * state, so ingest cost is bounded by (active slots) × (partial size),
  * never batch row count.
  *
  * With [[graft.wheel.WheelAggregators.HllDistinct]] this is a live
  * "distinct users over any time range" service: partials are fixed 2^p
  * bytes and register-max merging is idempotent, so re-delivered rows
  * (at-least-once sources) can only re-assert bits, never double-count.
  * Late data is governed by the upstream watermark; whatever the source
  * admits, the wheel merges — slot merging is order-free.
  *
  * Readers call [[snapshot]] for an immutable [[TypedHawWheel]]
  * (freeze-on-read, cheap when no batch arrived since the last call).
  */
final class StreamingTypedWheel[In, P: ClassTag, Out](
    timeColumn: String,
    valueCol: Column,
    agg: WheelAggregator[In, P, Out],
    readIn: Row => In,
    /** For MOMENT wheels ([[StreamingTypedWheel.moments]]): (failCond,
      * absExpr) — per batch, rows where failCond holds are counted into
      * the publish-gating castFail (a row whose value escaped the exact
      * fixed-point probe was silently dropped from the wheel, so serving
      * would be wrong), and max(absExpr) feeds the ANSI-overflow proof.
      * The counters ride the checkpoint. */
    momProbe: Option[(Column, Column)] = None) {

  private val live = new TypedRwWheel(agg)
  private val cached = new AtomicReference[(Long, TypedHawWheel[P, Out])]((0L, null))
  private var version = 0L

  /** Immutable point-in-time view. */
  def snapshot(): TypedHawWheel[P, Out] = {
    val (v, w) = cached.get()
    val cur = live.synchronized(version)
    if (w != null && v == cur) w
    else {
      val fresh = live.synchronized((version, live.freeze()))
      // Install only if strictly fresher: two concurrent freezers may race
      // here, and letting the staler pair win would force the next caller
      // to re-freeze needlessly. Each caller still returns its own freeze.
      var installed = false
      while (!installed) {
        val seen = cached.get()
        val stale = seen._2 != null && fresh._1 <= seen._1
        installed = stale || cached.compareAndSet(seen, fresh)
      }
      fresh._2
    }
  }

  @volatile private var publishTo: Option[(String, String, WheelAggregators.HllDistinct)] = None
  @volatile private var publishMoment: Option[(String, String, WheelAggregators.MomentStats)] = None
  @volatile private var publishFreq: Option[(String, String, WheelAggregators.CmsFreq)] = None
  @volatile private var publishQuantile: Option[(String, String, WheelAggregators.HdrQuantile)] = None
  @volatile private var publishTopK: Option[(String, String, WheelAggregators.TopTalkers)] = None
  // moment publish gates, accumulated per batch under the ingest lock
  private var momCastFail: Long = 0L
  private var momAbsMax: Double = 0.0
  // heavy-hitter publish gate: rows with a live time but a NULL key,
  // skipped by the wheel — the optimizer's topK arm serves only when 0
  // (a GROUP BY key query has a NULL group the summary cannot see)
  private var topkNullKeys: Long = 0L

  /** Publishes freeze-on-read snapshots of this wheel into the optimizer's
    * [[WheelRegistry]] as the HLL distinct index for `column` of the table
    * at `path`, re-published after every batch (swap-on-version,
    * fingerprint 0 — freshness is the stream's version, not a file
    * listing). From then on batch SQL `hll_distinct(column)` over a time
    * range of that table answers at plan time with the stream's
    * watermark-consistent registers — a LIVE "distinct users over any
    * range" service. Only HLL-aggregated wheels can publish (the rule's
    * distinct arm is sketch-specific); the caller asserts this stream is
    * the table's feed, as with [[StreamingWheelIndex.register]]. */
  def register(path: String, column: String): Unit = agg match {
    case h: WheelAggregators.HllDistinct =>
      publishTo = Some((WheelRegistry.normalizePath(path), column, h))
      live.synchronized(publishLocked())
    case m: WheelAggregators.MomentStats =>
      publishMoment = Some((WheelRegistry.normalizePath(path), column, m))
      live.synchronized(publishLocked())
    case c: WheelAggregators.CmsFreq =>
      publishFreq = Some((WheelRegistry.normalizePath(path), column, c))
      live.synchronized(publishLocked())
    case q: WheelAggregators.HdrQuantile =>
      publishQuantile = Some((WheelRegistry.normalizePath(path), column, q))
      live.synchronized(publishLocked())
    case k: WheelAggregators.TopTalkers =>
      publishTopK = Some((WheelRegistry.normalizePath(path), column, k))
      live.synchronized(publishLocked())
    case other => throw new IllegalArgumentException(
      s"only HllDistinct, MomentStats, CmsFreq, HdrQuantile or TopTalkers wheels can register, got ${other.getClass.getSimpleName}")
  }

  /** The batch-built index the first publish displaced (if any); restored
    * by [[deregister]] — see [[StreamingWheelIndex.register]]'s layering
    * contract. */
  @volatile private var displaced: Option[TableIndex] = None

  /** This publisher's registration target, if registered: (path key,
    * column, family tag 0=hll 1=moments 2=cms 3=hdr 4=topk) — the single
    * resolution [[publishLocked]], [[deregister]], and [[saveSnapshot]]
    * share (a future family added to one copy but not another would
    * silently publish/withdraw the wrong map entry). */
  private def publishTarget: Option[(String, String, Int)] =
    publishTo.map(t => (t._1, t._2, 0))
      .orElse(publishMoment.map(t => (t._1, t._2, 1)))
      .orElse(publishFreq.map(t => (t._1, t._2, 2)))
      .orElse(publishQuantile.map(t => (t._1, t._2, 3)))
      .orElse(publishTopK.map(t => (t._1, t._2, 4)))

  /** Withdraws THIS publisher's sketch (its (column, "") entry): other
    * publishers' families stay registered, and a displaced batch-built
    * index is restored only when no live stream family would be lost by
    * the swap (review finding: an unconditional restore wiped families
    * layered after the displacement). A batch index that re-registered
    * over us is left untouched. */
  def deregister(): Unit = {
    // which (column, "") entry of which map is EXCLUSIVELY ours to withdraw
    publishTarget.foreach { case (key, column, fam) =>
      WheelRegistry.update(key, {
        case Some(cur) if cur.fingerprint == 0L =>
          val rest = new TableIndex(key, cur.timeColumn, tsAllNonNull = false, 0L)
          cur.allWheels.foreach(rest.put)
          cur.allDistinctWheels
            .filterNot(d => fam == 0 && d.column == column && d.filterKey == "")
            .foreach(rest.putDistinct)
          cur.allQuantileWheels
            .filterNot(q => fam == 3 && q.column == column && q.filterKey == "")
            .foreach(rest.putQuantile)
          cur.allMomentWheels
            .filterNot(m => fam == 1 && m.column == column && m.filterKey == "")
            .foreach(rest.putMoment)
          cur.allCoMomentWheels.foreach(rest.putCoMoment)
          cur.allFreqWheels
            .filterNot(f => fam == 2 && f.column == column && f.filterKey == "")
            .foreach(rest.putFreq)
          cur.allTopKWheels
            .filterNot(tk => fam == 4 && tk.column == column &&
              Option(tk.filterKey).getOrElse("") == "")
            .foreach(rest.putTopK)
          if (rest.allWheels.isEmpty && rest.allDistinctWheels.isEmpty &&
              rest.allQuantileWheels.isEmpty && rest.allMomentWheels.isEmpty &&
              rest.allCoMomentWheels.isEmpty && rest.allFreqWheels.isEmpty &&
              rest.allTopKWheels.isEmpty) displaced
          else {
            displaced.foreach(_ => System.err.println(
              s"[graft] deregister keeps live stream families for $key; the " +
                "displaced batch-built index is NOT restored (re-build to re-register)"))
            Some(rest)
          }
        case Some(cur) => Some(cur) // a batch index re-registered over us
        case None      => displaced
      })
    }
    publishTo = None
    publishMoment = None
    publishFreq = None
    publishQuantile = None
    publishTopK = None
    displaced = None
  }

  private def publishLocked(): Unit = {
    publishTarget.foreach { case (key, column, fam) =>
      val snap = snapshot()
      WheelRegistry.update(key, { existing =>
        val t = new TableIndex(key, timeColumn, tsAllNonNull = false, 0L)
        existing match {
          case Some(cur) if cur.fingerprint != 0L =>
            // batch-built: different consistency domain — displace loudly,
            // restore on deregister (round-6 advice)
            if (displaced.isEmpty) {
              displaced = Some(cur)
              System.err.println(s"[graft] streaming register displaces the " +
                s"batch-built index for $key; it will be restored on deregister()")
            }
          case Some(cur) =>
            // every other publisher's family rides along — numeric wheels
            // and other sketches alike; each put* is keyed by (column,
            // filterKey), so only OUR entry is replaced below
            cur.allWheels.foreach(t.put)
            cur.allDistinctWheels.foreach(t.putDistinct)
            cur.allQuantileWheels.foreach(t.putQuantile)
            cur.allMomentWheels.foreach(t.putMoment)
            cur.allCoMomentWheels.foreach(t.putCoMoment)
            cur.allFreqWheels.foreach(t.putFreq)
            cur.allTopKWheels.foreach(t.putTopK)
          case None => ()
        }
        ownFamilyInto(t, snap, column, fam)
        Some(t)
      })
    }
  }

  /** Adds THIS publisher's sketch family to `t`. P/Out are fixed by the agg
    * the wheel was constructed with, so these casts are sound by
    * construction. Shared by [[publishLocked]] and [[saveSnapshot]]. */
  private def ownFamilyInto(t: TableIndex, snap: TypedHawWheel[P, Out],
      column: String, fam: Int): Unit = fam match {
    case 0 =>
      t.putDistinct(DistinctIndexedWheel(
        snap.asInstanceOf[TypedHawWheel[Array[Byte], Long]], column,
        agg.asInstanceOf[WheelAggregators.HllDistinct]))
    case 1 =>
      t.putMoment(MomentIndexedWheel(
        snap.asInstanceOf[TypedHawWheel[WheelAggregators.Moments, WheelAggregators.Moments]],
        column, agg.asInstanceOf[WheelAggregators.MomentStats],
        momCastFail, momAbsMax))
    case 2 =>
      t.putFreq(FreqIndexedWheel(
        snap.asInstanceOf[TypedHawWheel[Array[Byte], Array[Byte]]], column,
        agg.asInstanceOf[WheelAggregators.CmsFreq]))
    case 4 =>
      t.putTopK(TopKIndexedWheel(
        snap.asInstanceOf[TypedHawWheel[WheelAggregators.TopKSummary, WheelAggregators.TopKSummary]],
        column, agg.asInstanceOf[WheelAggregators.TopTalkers],
        keyNullCount = topkNullKeys))
    case _ =>
      t.putQuantile(QuantileIndexedWheel(
        snap.asInstanceOf[TypedHawWheel[Array[Byte], Array[Byte]]], column,
        agg.asInstanceOf[WheelAggregators.HdrQuantile]))
  }

  /** Persists the PUBLISHED sketch index (this publisher's family only,
    * fingerprint 0) in [[graft.index.WheelIndexIO]]'s atomic format — the
    * [[StreamingWheelIndex.saveSnapshot]] counterpart for typed wheels
    * (round-12 task 7). A restarted service loads it at start and serves
    * sketch rewrites at the saved watermark before any stream publisher is
    * reconstructed. Requires [[register]] (the snapshot carries the table
    * key and column). */
  def saveSnapshot(file: String): Unit = live.synchronized {
    val (key, column, fam) = publishTarget.getOrElse(throw new IllegalStateException(
      "saveSnapshot requires register(path, column) first: the snapshot carries the table key"))
    val t = new TableIndex(key, timeColumn, tsAllNonNull = false, 0L)
    ownFamilyInto(t, snapshot(), column, fam)
    graft.index.WheelIndexIO.save(t, file)
  }

  /** Starts the maintenance query on a streaming DataFrame. */
  // ------------------------------------------------------------ checkpoint

  /** Checkpoint config signature: the aggregator kind (and precision for
    * HLL — different p ⇒ incompatible registers) plus the wheel's columns.
    * [[restoreState]] refuses a mismatched file instead of merging
    * incompatible partials. */
  private def configSig: String = {
    val aggSig = agg match {
      case h: WheelAggregators.HllDistinct => s"hll(p=${h.p})"
      case m: WheelAggregators.MomentStats => s"moments(scale=${m.scale})"
      case c: WheelAggregators.CmsFreq     => s"cms(d=${c.d},logW=${c.logW})"
      case q: WheelAggregators.HdrQuantile => s"hdr(s=${q.s})"
      // `,nk`: the checkpoint carries the trailing NULL-key gate long.
      // Pre-gate checkpoints (bare `topk(cap=…)`) then REFUSE with a clear
      // signature mismatch instead of hitting EOF mid-read (review
      // finding) — the documented recovery is the same as any sig change:
      // rebuild the stream state.
      case k: WheelAggregators.TopTalkers  => s"topk(cap=${k.cap},nk)"
      case other                           => other.getClass.getName
    }
    s"stw-v1|$timeColumn|$valueCol|$aggSig"
  }

  /** Checkpoints the live typed wheel to `file`, atomically, under the
    * ingest lock — the [[StreamingWheelIndex.saveState]] counterpart for
    * custom-aggregator (sketch) wheels. */
  def saveState(file: String): Unit = live.synchronized {
    val target = java.nio.file.Paths.get(file)
    val tmp = java.nio.file.Files.createTempFile(
      Option(target.getParent).getOrElse(java.nio.file.Paths.get(".")),
      ".wheelstream", ".tmp")
    try {
      scala.util.Using.resource(
        new java.io.ObjectOutputStream(new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(tmp), 1 << 20))) { o =>
        o.writeObject(configSig)
        o.writeObject(live)
        if (momProbe.isDefined) { o.writeLong(momCastFail); o.writeDouble(momAbsMax) }
        // topk checkpoints carry the NULL-key publish gate (sig says topk,
        // so read/write stay paired)
        if (agg.isInstanceOf[WheelAggregators.TopTalkers]) o.writeLong(topkNullKeys)
      }
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** Restores a checkpoint into this (fresh, pre-attach) wheel; returns the
    * saved watermark (ms) the source must resume after. Register-max
    * merging is idempotent for sketches, so even an overlap between the
    * restored state and replayed batches cannot double-count — the
    * emptiness guard still holds the restore to the fresh-instance
    * contract for non-idempotent aggregators. */
  def restoreState(file: String): Long = live.synchronized {
    require(version == 0L,
      "restoreState must run on a fresh wheel, before any batch")
    scala.util.Using.resource(
      new java.io.ObjectInputStream(
        new java.io.BufferedInputStream(
          java.nio.file.Files.newInputStream(java.nio.file.Paths.get(file)), 1 << 20))) { in =>
      val sig = in.readObject().asInstanceOf[String]
      require(sig == configSig,
        s"checkpoint was written by a differently-configured wheel ($sig != $configSig)")
      live.merge(in.readObject().asInstanceOf[TypedRwWheel[In, P, Out]])
      if (momProbe.isDefined) {
        momCastFail += in.readLong()
        momAbsMax = math.max(momAbsMax, in.readDouble())
      }
      if (agg.isInstanceOf[WheelAggregators.TopTalkers]) topkNullKeys += in.readLong()
    }
    version += 1
    live.watermark
  }

  def attach(stream: DataFrame, queryName: String): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // heavy-hitter wheels ride the counted build: the NULL-key publish
        // gate is accumulated INSIDE the same pass (a separate count()
        // action would double per-batch ingest work — review finding)
        val (bw, nullKeys) = agg match {
          case _: WheelAggregators.TopTalkers =>
            TypedWheelBuild.buildRwCounted(batch, timeColumn, valueCol, agg, readIn)
          case _ =>
            (TypedWheelBuild.buildRw(batch, timeColumn, valueCol, agg, readIn), 0L)
        }
        // moment gates: one cheap extra aggregate over the (already
        // materialized) micro-batch — the publish is unsound without them
        val probe = momProbe.map { case (failCond, absExpr) =>
          import org.apache.spark.sql.functions.{lit, max, sum, when}
          val r = batch.agg(
            sum(when(failCond, lit(1L)).otherwise(lit(0L))), max(absExpr)).head()
          (if (r.isNullAt(0)) 0L else r.getLong(0),
            if (r.isNullAt(1)) 0.0 else r.getDouble(1))
        }
        live.synchronized {
          probe.foreach { case (fails, am) =>
            momCastFail += fails
            momAbsMax = math.max(momAbsMax, am)
          }
          topkNullKeys += nullKeys
          live.merge(bw)
          version += 1
          publishLocked()
        }
        ()
      }
      .start()
}

object StreamingTypedWheel {
  /** A continuously-maintained EXACT-moment wheel over `column` — the live
    * "variance over any time range" service: once registered, batch SQL
    * `wheel_var_samp(CAST(column AS DECIMAL(18, scale)))` (and the other
    * three stats) over a time range of the table answers at plan time from
    * the stream's moments. The value rides the same exact fixed-point
    * probe as the batch build ([[graft.index.UWheelIndex]]): rows that
    * fail it are counted and poison the publish gate rather than silently
    * skewing the moments. */
  def moments(timeColumn: String, column: String, scale: Int = 2)
      : StreamingTypedWheel[Long, WheelAggregators.Moments, WheelAggregators.Moments] = {
    import org.apache.spark.sql.functions.{abs, col, lit}
    val f = col(column).try_cast(s"decimal(18,$scale)")
    val u = (f * lit(math.pow(10, scale).toLong).cast("decimal(10,0)")).cast("long")
    new StreamingTypedWheel(timeColumn, u,
      new WheelAggregators.MomentStats(scale), (r: Row) => r.getLong(1),
      momProbe = Some((col(column).isNotNull && f.isNull, abs(col(column).cast("double")))))
  }

  /** A continuously-maintained HDR-quantile wheel over `column` — the live
    * "p99 over any time range" service: once registered, batch SQL
    * `hdr_quantile(column, q[, s])` over a time range of the table answers
    * at plan time from the stream's per-second bin partials. The double
    * cast is the same value image the batch build projects
    * ([[graft.index.UWheelIndex]]'s quantile columns), so bins agree
    * bit-for-bit with what the SQL aggregate over the raw rows computes. */
  def quantiles(timeColumn: String, column: String, s: Int = 7)
      : StreamingTypedWheel[Double, Array[Byte], Array[Byte]] = {
    import org.apache.spark.sql.functions.col
    new StreamingTypedWheel(timeColumn, col(column).cast("double"),
      new WheelAggregators.HdrQuantile(s), (r: Row) => r.getDouble(1))
  }

  /** A continuously-maintained Count-Min frequency wheel over `key` — the
    * live "how often did key k occur in any time range" service: once
    * registered, batch SQL `cms_freq(key, k[, d, logW])` answers at plan
    * time from the stream's per-second counter partials. Counter addition
    * is NOT idempotent — an at-least-once source that re-delivers a batch
    * overcounts, consistent with the CMS upper-bound contract but worth
    * knowing; use exactly-once sinks/sources when the estimate must match
    * a batch build. */
  def freq(timeColumn: String, key: String, d: Int = 4, logW: Int = 12)
      : StreamingTypedWheel[Long, Array[Byte], Array[Byte]] = {
    import org.apache.spark.sql.functions.col
    new StreamingTypedWheel(timeColumn, col(key).cast("long"),
      new WheelAggregators.CmsFreq(d, logW), (r: Row) => r.getLong(1))
  }

  /** A continuously-maintained temporal heavy-hitter wheel over `key` —
    * the live "WHICH keys dominated any time range" service
    * ([[graft.index.TopKIndexedWheel]]'s streaming twin): [[register]]
    * publishes freeze-on-read snapshots so
    * `TableIndex.topKWheel(key).topK(s, e, k)` serves certified-exact
    * top-k from the stream's summaries. The live state keeps EXACT
    * per-second summaries (ingest combine is a pointwise sum), so
    * at-least-once re-delivery overcounts like any counting family —
    * use exactly-once sources when the certificate must match a batch
    * build. Compaction to `cap` candidates happens only at the
    * deterministic freeze, identical to the batch build. */
  def topTalkers(timeColumn: String, key: String, cap: Int = 64)
      : StreamingTypedWheel[Long, WheelAggregators.TopKSummary, WheelAggregators.TopKSummary] = {
    import org.apache.spark.sql.functions.col
    new StreamingTypedWheel(timeColumn, col(key).cast("long"),
      new WheelAggregators.TopTalkers(cap), (r: Row) => r.getLong(1))
  }
}
