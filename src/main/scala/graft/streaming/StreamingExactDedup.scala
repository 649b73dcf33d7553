package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EXACT-dedup gate: the batch `dd_exact` operator (hash-groupBy
  * on a normalized key, keep-one representative) as an arrival-time
  * Structured Streaming operator — "is this arriving document an exact
  * duplicate of anything seen, and of whom?", answered in the micro-batch
  * it arrives in. The exact sibling of [[StreamingNearDup]]: that gate
  * flags PROBABLE near-dups via banded LSH, this one decides exact-key
  * duplicates with ZERO false positives (same key ⇒ same normalized text
  * prefix, the `dd_exact` contract key).
  *
  * Emits one row per arriving document: `(doc_id, rep_id, is_dup)` where
  * `rep_id` is the group's REPRESENTATIVE — the first-arrived member — and
  * `is_dup = doc_id != rep_id`. A filter `!is_dup` downstream is exactly
  * the online keep-set.
  *
  * Batch-semantics note: batch `dd_exact` keeps the MIN doc_id per group; a
  * stream cannot know a smaller id arrives later, so the streaming gate
  * keeps the FIRST-ARRIVED (the only causal choice — an ingest pipeline
  * must decide "keep or drop" when the document arrives). When ids arrive
  * in ascending id order the two coincide (spec-pinned); otherwise they
  * pick different — equally valid — representatives of the SAME groups.
  * Replay-safe: a re-delivered doc re-emits its original verdict (state
  * stores only the representative id, so re-processing is idempotent in
  * the emitted mapping, duplicated only as rows — dedup downstream if
  * exactly-once matters).
  *
  * State: ONE long per distinct key (the representative's doc_id) — far
  * smaller than the near-dup gate's banded state. `idleEvict` bounds total
  * state by the active working set exactly as in
  * [[StreamingNearDup.candidatesFromBandKeys]]: an evicted key's next
  * arrival starts a fresh group (it becomes its own representative).
  *
  * PRODUCTION STATE STORE: one long per key still means corpus-cardinality
  * state at 100 TB — run under the RocksDB provider
  * (`spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`)
  * so state lives on executor-local disk instead of the heap; see the
  * config block on [[StreamingNearDup]]. Verdicts are provider-agnostic
  * (`RocksDbStateStoreSpec` pins group-structure equality under RocksDB).
  */
object StreamingExactDedup {

  /** Gate over the `dd_exact` contract key: `md5(substring(text, 1, 30))`. */
  def verdicts(df: DataFrame, idCol: String, textCol: String,
      idleEvict: Option[java.time.Duration] = None): Dataset[(Long, Long, Boolean)] =
    verdictsByKey(
      df.select(col(idCol).cast("long").as("id"),
        md5(substring(col(textCol), 1, 30)).as("k")),
      idleEvict)

  /** Gate over any `(id, k)` keyed frame (full-text hash, simhash-0 key,
    * URL, …): emits `(doc_id, rep_id, is_dup)` per arriving row. */
  def verdictsByKey(keyed: DataFrame,
      idleEvict: Option[java.time.Duration] = None): Dataset[(Long, Long, Boolean)] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val timeoutKind = idleEvict match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None    => GroupStateTimeout.NoTimeout
    }
    keyed
      .select(col("id").cast("long"), col("k").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, timeoutKind)(
        (_: String, rows: Iterator[(Long, String)], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // Option semantics, NOT a sentinel: a group whose stored
            // representative happens to equal any in-band Long must not
            // be re-read as empty (that would silently split the group,
            // each later member becoming its own keeper).
            var rep: Option[Long] = state.getOption
            val out = Seq.newBuilder[(Long, Long, Boolean)]
            rows.foreach { case (id, _) =>
              rep match {
                case None =>
                  rep = Some(id)
                  out += ((id, id, false))
                case Some(r) =>
                  out += ((id, r, id != r))
              }
            }
            rep.foreach(state.update)
            idleEvict.foreach(d => state.setTimeoutDuration(d.toMillis))
            out.result().iterator
          }
        })
  }
}
