package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Pq
import graft.queries.SimilarityQueries
import graft.queries.SimilarityQueries.RpqArtifacts

/** Streaming ANN ingest tier (round-16 verdict task 6): "what are the
  * top-k most similar items among everything ALREADY INGESTED?" answered
  * at arrival time — the streaming analogue of the batch IVF-residual-PQ
  * tier ([[SimilarityQueries.rpqSearch]]), where [[StreamingNearDup]]'s
  * gates only answer the binary "is this a near-dup of anything seen".
  *
  * Shape: arrivals are routed map-side against FROZEN artifacts (the
  * [[graft.queries.AnnIndexIO]] hierarchy + codebook — O(√n) centroid
  * floats and an m·ks table, a bounded closure constant exactly like the
  * SRP planes) into one HOME insert event carrying the arrival's residual
  * code + norm, plus `nprobe` PROBE events carrying the query vector and
  * its per-bucket dot(q, c) constant. Events shard by bucket id through
  * ONE stateful operator: each (cid) group holds the codes of everything
  * assigned to it so far — 32 bytes/vector of state (16-byte code + id +
  * norm), the SAME compressed scan tier the batch index persists, living
  * in the state store (RocksDB in production, like the near-dup gates) —
  * and each probe event ADC-scores the bucket's current members and emits
  * its per-bucket top-k. Global top-k per query = [[mergeTopK]] over the
  * emitted candidates (per-shard top-k then merge — the standard
  * distributed ANN serving split), because every global winner is by
  * definition in its own bucket's top-k.
  *
  * Arithmetic parity: routing and scoring call the SAME [[Pq]] kernels and
  * fold orders the batch expressions compile to (encode, lut, adc, the
  * vec_dot double fold, the (sim desc, id asc) tie order), so on the same
  * prefix the emitted scores are BIT-IDENTICAL to the batch tier —
  * `StreamingAnnTopKSpec` pins gate ≡ batch across micro-batch choppings.
  *
  * Ordering semantics: a probe sees exactly the arrivals that precede it —
  * state from earlier micro-batches plus earlier rows of its own batch,
  * reconstructed WITHIN a batch by ascending id (inserts before probes at
  * equal id; self-pairs suppressed). For an id-monotone stream (ingest
  * with assigned increasing ids — the spec's framing) the output is
  * therefore INDEPENDENT of micro-batch chopping; for out-of-order streams
  * "already ingested" is inherently arrival-order-dependent.
  *
  * State bound: total state is O(n) codes — compressed 16× below the raw
  * vectors and sharded by bucket (~√n groups) across executors; per-bucket
  * state grows with the bucket's membership (~n/√n), which is the batch
  * scan tier's own row distribution, not a hot-key pathology. Run
  * production gates under the RocksDB provider like [[StreamingNearDup]]
  * (state on local disk, changelog checkpointing). Distribution drift has
  * the same contract as [[graft.queries.AnnIndexIO.refresh]]: frozen
  * centroids quantize drifted arrivals with growing residuals — recall
  * degrades smoothly, the operator signal to re-train and restart the
  * gate. */
object StreamingAnnTopK {

  /** Driver-side frozen artifacts: centroid arrays sorted by id (so
    * argmax tie-breaks reproduce the batch (sim desc, id asc) order by
    * first-wins iteration) + the residual codebook. Bounded by
    * construction: O(√n) fine centroids, O(∜n) coarse, m·ks·sub codebook
    * doubles. */
  final case class FrozenAnn(
      fineIds: Array[Long], fineVecs: Array[Array[Float]],
      fineNorms: Array[Double], fineCcids: Array[Long],
      coarseIds: Array[Long], coarseVecs: Array[Array[Float]],
      coarseNorms: Array[Double],
      cents: Array[Double], m: Int, ks: Int, nprobe: Int) extends Serializable

  /** Collects the (small) centroid frames of built-or-loaded artifacts
    * into the closure constant the gate routes against. The collect is
    * bounded by the IVF geometry (~√n + ∜n rows). */
  def freeze(art: RpqArtifacts): FrozenAnn = {
    val f = art.fines.orderBy("cid").collect()
    val c = art.coarse.orderBy("ccid").collect()
    FrozenAnn(
      fineIds = f.map(_.getLong(0)),
      fineVecs = f.map(_.getSeq[Float](1).toArray),
      fineNorms = f.map(_.getDouble(2)),
      fineCcids = f.map(_.getLong(3)),
      coarseIds = c.map(_.getLong(0)),
      coarseVecs = c.map(_.getSeq[Float](1).toArray),
      coarseNorms = c.map(_.getDouble(2)),
      cents = art.cents, m = SimilarityQueries.RpqM, ks = art.ks,
      // the batch tier's served operating point — calibrated when the
      // artifacts carry one, else the nprobeFor floor
      nprobe = SimilarityQueries.servedNprobe(art))
  }

  /** One routed event: a HOME insert (`probe = false`: code + norm) or a
    * PROBE (`probe = true`: query vector + the dot(q, c) bucket constant). */
  private[streaming] final case class Ev(
      cid: Long, probe: Boolean, id: Long,
      code: Array[Byte], nrm: Double, qdotc: Double, v: Array[Float])

  /** Per-bucket state: parallel arrays of (id, m-byte code, norm) for every
    * vector assigned to the bucket so far — codes flattened at stride m. */
  final case class BucketState(ids: Array[Long], codes: Array[Byte], norms: Array[Double])

  /** The VecDot double fold (sequential, index order) — same arithmetic
    * the batch expression compiles to. */
  private def dotFF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Map-side routing against the frozen artifacts: coarse-first home
    * assignment (ties → smallest id, like the batch argmax), residual
    * encode through [[Pq.encode]], global fine ranking for the probe set
    * (csim desc, cid asc — the batch row_number order). */
  private def route(df: DataFrame, idCol: String, vecCol: String,
      fz: FrozenAnn): Dataset[Ev] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val nrm = math.sqrt(dotFF(v, v))
        // nearest coarse (first-wins over ascending ids = smallest-id tie)
        var bc = 0; var bcs = Double.NegativeInfinity
        var i = 0
        while (i < fz.coarseIds.length) {
          val s = dotFF(v, fz.coarseVecs(i)) / (nrm * fz.coarseNorms(i))
          if (s > bcs) { bcs = s; bc = i }
          i += 1
        }
        val ccid = fz.coarseIds(bc)
        // nearest fine within the coarse cell
        var bf = -1; var bfs = Double.NegativeInfinity
        i = 0
        while (i < fz.fineIds.length) {
          if (fz.fineCcids(i) == ccid) {
            val s = dotFF(v, fz.fineVecs(i)) / (nrm * fz.fineNorms(i))
            if (s > bfs) { bfs = s; bf = i }
          }
          i += 1
        }
        require(bf >= 0, s"coarse cell $ccid has no fine centroid")
        // residual (float subtraction, the batch zip_with) + frozen encode
        val fv = fz.fineVecs(bf)
        val r = new Array[Float](v.length)
        i = 0
        while (i < v.length) { r(i) = v(i) - fv(i); i += 1 }
        val code = Pq.encode(new GenericArrayData(r), true, fz.cents, fz.m, fz.ks)
        // probe set: global fine ranking, (csim desc, cid asc)
        val qd = new Array[Double](fz.fineIds.length)
        i = 0
        while (i < fz.fineIds.length) { qd(i) = dotFF(v, fz.fineVecs(i)); i += 1 }
        val order = fz.fineIds.indices.sortBy(fi =>
          (-qd(fi) / (nrm * fz.fineNorms(fi)), fz.fineIds(fi)))
        val nprobe = math.min(fz.nprobe, order.length)
        Ev(fz.fineIds(bf), probe = false, id, code, nrm, 0.0, null) +:
          (0 until nprobe).map { p =>
            val fi = order(p)
            Ev(fz.fineIds(fi), probe = true, id, null, nrm, qd(fi), v)
          }
      }
  }

  /** The stateful gate: per-bucket top-`k` ADC candidates `(qi, xi, asim)`
    * for every arriving vector, against everything ingested before it.
    * Compose with [[mergeTopK]] for the global per-query top-k. */
  def topKCandidates(df: DataFrame, idCol: String, vecCol: String,
      fz: FrozenAnn, k: Int): Dataset[(Long, Long, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    route(df, idCol, vecCol, fz)
      .groupByKey(_.cid)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[Ev], state: GroupState[BucketState]) => {
          val st = state.getOption.getOrElse(
            BucketState(Array.emptyLongArray, Array.emptyByteArray, Array.emptyDoubleArray))
          val ids = scala.collection.mutable.ArrayBuffer.from(st.ids)
          val codes = scala.collection.mutable.ArrayBuffer.from(st.codes)
          val norms = scala.collection.mutable.ArrayBuffer.from(st.norms)
          val present = scala.collection.mutable.HashSet.from(st.ids)
          val out = Seq.newBuilder[(Long, Long, Double)]
          // ascending id, inserts before probes at equal id: a probe sees
          // exactly the strictly-earlier arrivals (self-pairs guarded)
          rows.toSeq.sortBy(e => (e.id, e.probe)).foreach { e =>
            if (!e.probe) {
              if (!present(e.id)) { // replay-safe
                present += e.id
                ids += e.id
                codes ++= e.code
                norms += e.nrm
              }
            } else if (ids.nonEmpty) {
              val lut = Pq.lut(new GenericArrayData(e.v), true, fz.cents, fz.m, fz.ks)
              // bounded selection, (asim desc, xi asc) — the topk_pairs order
              val top = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
              var i = 0
              while (i < ids.length) {
                val xi = ids(i)
                if (xi != e.id) {
                  var adc = 0.0
                  var mi = 0
                  while (mi < fz.m) {
                    adc += lut(mi * fz.ks + (codes(i * fz.m + mi) & 0xff))
                    mi += 1
                  }
                  val asim = (e.qdotc + adc) / (e.nrm * norms(i))
                  val cand = (asim, xi)
                  def beats(a: (Double, Long), b: (Double, Long)): Boolean =
                    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
                  if (top.length < k || beats(cand, top.last)) {
                    var j = math.min(top.length, k - 1)
                    if (top.length < k) top += cand
                    while (j > 0 && beats(cand, top(j - 1))) { top(j) = top(j - 1); j -= 1 }
                    top(j) = cand
                  }
                }
                i += 1
              }
              top.foreach { case (asim, xi) => out += ((e.id, xi, asim)) }
            }
          }
          state.update(BucketState(ids.toArray, codes.toArray, norms.toArray))
          out.result().iterator
        })
  }

  /** Batch reducer for the gate's output: global top-`k` per query from
    * the per-bucket candidates, same (asim desc, xi asc) total order —
    * run inside `foreachBatch` or over the collected sink. */
  def mergeTopK(cands: DataFrame, k: Int): DataFrame =
    cands.toDF("qi", "xi", "asim")
      .groupBy("qi")
      .agg(expr(s"topk_pairs(asim, xi, $k)").as("tk"))
      .select(col("qi"), explode(col("tk")).as("p"))
      .select(col("qi"), col("p").getField("i").as("xi"), col("p").getField("s").as("asim"))
}
