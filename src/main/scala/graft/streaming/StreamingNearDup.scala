package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate GATE: the MinHash banded-LSH candidate stage of
  * [[graft.queries.SimilarityQueries.minhashLsh]] as a Structured Streaming
  * operator — flag an arriving document the moment any of its band keys
  * collides with an already-ingested document's, the shape an ingest
  * pipeline needs ("is this page a near-dup of anything seen so far?")
  * where the batch operator asks the retrospective all-pairs question.
  *
  * Same geometry as the batch path (64 perms, 16 bands × 4 rows, identical
  * `xxhash64`/`hash` arithmetic), so the candidate-pair semantics coincide:
  * over the same corpus the streaming gate's emitted pair set equals the
  * batch `bandedCandidates` set — PROVIDED every (band, bucket) stays at or
  * under `maxBucket` (pinned by `StreamingNearDupSpec`; true of the test
  * corpora and of any corpus where the batch guard never fires). Past the
  * cap the two DIVERGE by design: streaming has already emitted the first
  * C(cap, 2) pairs and freezes (a stream cannot retract), while batch drops
  * the oversize bucket wholesale — so on hot-bucket corpora the streaming
  * set is a superset of batch on the frozen buckets and identical
  * elsewhere (also spec-pinned). Differences forced by streaming:
  *
  *  - Signatures are computed MAP-SIDE per row (`array_min` over a
  *    `transform` of the row's distinct shingles) instead of the batch
  *    explode + `groupBy(doc).agg(min…)` — a streaming aggregation would
  *    buffer rows behind a watermark, while the per-row form emits a
  *    document's band keys in the micro-batch it arrives in. `word_ngrams`
  *    returns DISTINCT shingles, so `array_min` over it is bit-identical
  *    to `min` over the exploded set.
  *  - Bucket state is capped like the batch `maxBucket` guard, but
  *    prospectively: a bucket that GROWS past the cap stops emitting new
  *    pairs from then on (already-emitted pairs cannot be retracted from a
  *    stream), where batch drops the whole oversize bucket. A hot band
  *    bucket (the stop-shingle pathology) therefore costs O(cap) state and
  *    O(cap²) emitted pairs, then goes quiet — state per bucket is bounded
  *    no matter how adversarial the stream.
  *
  * At scale the state store shards by (band, bucket-hash) across
  * executors — each group holds ≤ cap doc ids — and the gate emits only
  * CANDIDATES: exact-Jaccard verification (which needs both documents'
  * shingle sets) belongs to a downstream batch join against the corpus,
  * exactly like the batch operator's verify stage.
  *
  * PRODUCTION STATE STORE: the default HDFSBackedStateStoreProvider holds
  * every state row on the executor heap — bounded per bucket here, but at
  * 100 TB ingest the number of live (band, bucket) groups is itself
  * corpus-sized, an executor-heap OOM class even with `idleEvict`. Run
  * production gates under the RocksDB provider (state on local disk,
  * bounded block-cache memory, changelog checkpointing for fast recovery):
  * {{{
  * spark.sql.streaming.stateStore.providerClass =
  *   org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
  * spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled = true
  * }}}
  * The gate's logic is provider-agnostic; `RocksDbStateStoreSpec` pins
  * that the emitted pair set is identical under RocksDB, and the bench
  * records `gate_state_rocksdb_*` alongside the default-provider bounds.
  */
object StreamingNearDup {

  private val NumPerm = 64
  private val Bands = 16
  private val RowsPerBand = NumPerm / Bands

  /** (id, band, bk) rows for every input document of ≥ 3 words — map-side
    * only (no aggregation), so it works identically on batch and streaming
    * frames. Band-key arithmetic is bit-identical to the batch MinHash
    * path: `m_i = min over distinct 3-shingles of xxhash64(i, s)`,
    * `bk = hash(m_{4b}, …, m_{4b+3})`. */
  def bandKeys(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withShingles = df
      .where(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).cast("long").as("id"),
        expr(s"word_ngrams(split($textCol, ' '), 3)").as("sh"))
    val sigCols = (0 until NumPerm).map { i =>
      array_min(transform(col("sh"), s => xxhash64(lit(i), s))).as(s"m$i")
    }
    val sigs = withShingles.select(col("id") +: sigCols: _*)
    val bandCols = (0 until Bands).map { b =>
      val cols = (b * RowsPerBand until (b + 1) * RowsPerBand).map(i => col(s"m$i"))
      struct(lit(b).as("band"), hash(cols: _*).as("bk"))
    }
    sigs.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
  }

  /** Candidate near-dup pairs (i, j), i < j, for arriving DOCUMENTS (the
    * MinHash text gate). Equals the batch candidate set only while every
    * bucket stays ≤ `maxBucket` — see [[candidatesFromBandKeys]]. */
  def candidates(df: DataFrame, idCol: String, textCol: String,
      maxBucket: Int = 4096,
      idleEvict: Option[java.time.Duration] = None): Dataset[(Long, Long)] =
    candidatesFromBandKeys(bandKeys(df, idCol, textCol), maxBucket, idleEvict)

  /** Candidate near-dup pairs for arriving EMBEDDINGS — the SRP-LSH gate,
    * same plane geometry as the batch `dd_embed_lsh`
    * ([[graft.queries.SimilarityQueries.srpNearDupPairs]]): `srp_band_keys`
    * is already one map-side codegen'd expression, so the streaming form
    * is just its explode through the shared stateful bucket gate. */
  def embeddingCandidates(df: DataFrame, idCol: String, vecCol: String,
      maxBucket: Int = 4096,
      idleEvict: Option[java.time.Duration] = None): Dataset[(Long, Long)] = {
    import graft.queries.SimilarityQueries.{SrpBits, SrpRowsPerBand}
    candidatesFromBandKeys(
      df.select(col(idCol).cast("long").as("id"),
        posexplode(expr(s"srp_band_keys($vecCol, $SrpBits, $SrpRowsPerBand)"))
          .as(Seq("band", "bk"))),
      maxBucket, idleEvict)
  }

  /** The shared stateful gate: candidate pairs (i, j), i < j, from any
    * `(id, band, bk)` band-key frame (MinHash text bands, SRP embedding
    * bands, SimHash Hamming bands…) — j is always from the current
    * micro-batch, i from state (or an earlier row of the same batch).
    * Pairs may repeat when two items collide on several bands (the batch
    * path's `.distinct()`); deduplicate downstream if exact-once matters.
    * State: per (band, bk) bucket, the first-`maxBucket` ids in arrival
    * order; a bucket past the cap is frozen (≤ `maxBucket + 1` longs per
    * bucket, the +1 being the freeze sentinel).
    *
    * Batch-equality precondition: the emitted pair set equals the batch
    * [[graft.queries.SimilarityQueries.bandedCandidates]] set iff every
    * (band, bk) bucket's true size is ≤ `maxBucket` (and, with
    * `idleEvict` set, no true pair's members arrive more than the idle
    * window apart). An over-cap bucket diverges BY DESIGN — streaming
    * keeps the C(maxBucket, 2) pairs it emitted before the freeze, batch
    * drops the whole bucket — and buckets at-or-under the cap are
    * unaffected either way.
    *
    * TOTAL-state bound: `maxBucket` caps each bucket at ≤ cap+1 longs,
    * but distinct (band, bk) buckets accrete for the stream's lifetime —
    * at 100 TB-scale ingest the bucket COUNT is the state bound that
    * matters. `idleEvict = Some(d)` evicts any bucket that has received
    * no member for processing-time `d` (near-duplicates in real ingest
    * overwhelmingly arrive close together — re-crawls, re-uploads,
    * mirror bursts), making total state O(buckets active within d × cap)
    * instead of O(all buckets ever). The trade is explicit and one-sided:
    * a pair whose members arrive more than `d` of bucket inactivity
    * apart is missed (the gate becomes idleness-windowed); pairs within
    * the window are unaffected, and an evicted bucket that re-fills
    * simply starts a fresh window (it can re-freeze, re-emit — replay
    * dedup downstream is unchanged). */
  def candidatesFromBandKeys(bands: DataFrame,
      maxBucket: Int = 4096,
      idleEvict: Option[java.time.Duration] = None): Dataset[(Long, Long)] = {
    val spark = bands.sparkSession
    import spark.implicits._
    val timeoutKind = idleEvict match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None    => GroupStateTimeout.NoTimeout
    }
    bands
      .select(col("id").cast("long"), col("band").cast("int"),
        col("bk").cast("long"))
      .as[(Long, Int, Long)]
      .groupByKey { case (_, band, bk) => (band, bk) }
      .flatMapGroupsWithState(OutputMode.Update, timeoutKind)(
        (_: (Int, Long), rows: Iterator[(Long, Int, Long)],
            state: GroupState[Array[Long]]) => {
          if (state.hasTimedOut) {
            // idle bucket: drop the members, emit nothing — the state row
            // disappears until (if ever) the bucket fills again
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Array.emptyLongArray)
            val out = Seq.newBuilder[(Long, Long)]
            rows.foreach { case (id, _, _) =>
              // frozen bucket (cap reached) emits nothing more; a re-arriving
              // id (stream replay) pairs with nobody new
              if (seen.length <= maxBucket && !seen.contains(id)) {
                if (seen.length < maxBucket) {
                  seen.foreach { s =>
                    out += (if (s < id) (s, id) else (id, s))
                  }
                  seen = seen :+ id
                } else {
                  // cap hit NOW: freeze with a sentinel length so later
                  // arrivals skip the pair scan entirely
                  seen = seen :+ id
                }
              }
            }
            state.update(seen)
            // re-arm on every batch that touches the bucket: "idle" means
            // no member for d, not "alive for at most d"
            idleEvict.foreach(d => state.setTimeoutDuration(d.toMillis))
            out.result().iterator
          }
        })
  }
}
