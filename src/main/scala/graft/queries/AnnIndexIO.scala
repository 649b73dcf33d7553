package graft.queries

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.util.Using

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.index.UWheelIndex
import graft.queries.SimilarityQueries.RpqArtifacts

/** Persistence for the residual-PQ ANN index (round-16 verdict task 3) —
  * the [[graft.index.WheelIndexIO]] discipline applied to the ANN tier:
  * centroids, codebook, codes, and assignments are deterministic artifacts
  * of the corpus, so at 100 TB they should be encoded ONCE and served from
  * disk, not recomputed per query run (the wheels got save/load + refresh
  * in rounds 13–15; this closes the same lifecycle for ANN).
  *
  * Layout under an index directory:
  * {{{
  *   ann_meta.bin        java-serialized [[AnnMeta]], written atomically
  *                       (temp + ATOMIC_MOVE) LAST in every mutation
  *   fines/              parquet (cid, vc, nc, ccid) — ~√n rows
  *   coarse/             parquet (ccid, vcc, ncc)   — ~∜n rows
  *   codes_base/         parquet (xi, cid, nx, codes) — ONE row per corpus
  *   codes_delta_<fp>/   vector: the 16-byte residual code + stored norm
  * }}}
  * The scan tier (codes) is parquet — a DISTRIBUTED dataset read with the
  * stock scan, partition-pruned and column-pruned like any table — because
  * at 10⁸⁺ vectors it is itself big data; only the codebook (≤ 128 KiB of
  * doubles) rides in the meta file as a plan constant. Raw vectors are NOT
  * persisted: the exact re-rank reads them back from the SOURCE table by
  * id, so the index stays ~16× under the corpus it serves.
  *
  * Safety — the fingerprint staleness gate: [[AnnMeta]] carries the
  * corpus' (path, length, modificationTime) listing and its fingerprint at
  * build time; [[loadFreshOrRebuild]] re-fingerprints the CURRENT listing
  * and a mismatch rebuilds instead of serving — a stale index is inert,
  * never wrong. [[refresh]] is APPEND-ONLY: new files are encoded against
  * the FROZEN hierarchy + codebook (standard FAISS practice — the index
  * never re-trains on refresh), a changed or deleted indexed file FAILS
  * LOUD (rebuild is the only sound answer), and each delta lands in its
  * own `codes_delta_<fingerprint>` directory written with overwrite
  * semantics so a crashed refresh re-run is idempotent (meta — the commit
  * point — is only rewritten after the delta parquet is complete).
  *
  * Recall contract under refresh: appended vectors quantize against
  * centroids trained on the ORIGINAL corpus. While the append's
  * distribution matches, recall holds (the spec's planted-duplicate checks
  * recover through frozen artifacts); under distribution DRIFT the
  * residuals grow and in-bucket ranking degrades smoothly — the operator
  * signal to schedule a rebuild, which re-trains everything. This is the
  * same contract FAISS documents for `IndexIVF.add` after `train`. */
object AnnIndexIO {

  private val FormatVersion = 1

  /** Everything small enough to belong in one atomically-replaced file:
    * corpus identity (path + listing + fingerprint), trained-corpus size
    * `n` (sizes `nprobeFor` at serve time), geometry, the residual
    * codebook, and the ordered list of code directories (base + deltas). */
  @SerialVersionUID(1L)
  private[graft] final case class AnnMeta(
      version: Int,
      corpusPath: String,
      fingerprint: Long,
      files: Seq[(String, Long, Long)],
      n: Long,
      m: Int,
      ks: Int,
      cents: Array[Double],
      codeDirs: Seq[String]) extends Serializable

  private def metaPath(dir: String) = Paths.get(dir, "ann_meta.bin")

  private[graft] def writeMeta(dir: String, meta: AnnMeta): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Files.createTempFile(Paths.get(dir), ".annmeta", ".tmp")
    try {
      Using.resource(new ObjectOutputStream(new java.io.BufferedOutputStream(
        Files.newOutputStream(tmp), 1 << 16)))(
        _.writeObject(meta))
      Files.move(tmp, metaPath(dir), StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
  }

  private[graft] def readMeta(dir: String): AnnMeta = {
    val m =
      try Using.resource(new ObjectInputStream(new java.io.BufferedInputStream(
        Files.newInputStream(metaPath(dir)), 1 << 16)))(
        _.readObject().asInstanceOf[AnnMeta])
      catch {
        case e: java.io.InvalidClassException =>
          throw new java.io.InvalidObjectException(
            s"${metaPath(dir)} was saved by an incompatible graft version " +
              s"(stale ANN index format): rebuild and re-save — ${e.getMessage}")
      }
    require(m.version == FormatVersion,
      s"ANN index format v${m.version} at $dir; this build reads v$FormatVersion — rebuild")
    // geometry gate: an index persisted under a different compile-time
    // sub-quantizer shape would pass the fingerprint check (same corpus)
    // but decode garbage — PqAdc derives m from the stored code LENGTH, so
    // a LUT built at the current RpqM against codes of another m indexes
    // the wrong cells with no error anywhere (review finding)
    require(m.m == SimilarityQueries.RpqM,
      s"ANN index at $dir was built at m=${m.m} (this build: " +
        s"${SimilarityQueries.RpqM}) — geometry changed, rebuild")
    require(m.ks >= 1 && m.cents.length % (m.m * m.ks) == 0 && m.cents.nonEmpty,
      s"ANN index at $dir has a malformed codebook " +
        s"(${m.cents.length} doubles for m=${m.m}, ks=${m.ks}) — rebuild")
    m
  }

  /** SESSION-scoped default index root for a corpus directory: under the
    * JVM temp dir, keyed by the session UUID so contract entries
    * (`ann_ivf_rpq_served`) have a deterministic place to build-or-load
    * without configuration AND concurrent sessions can never race each
    * other's non-atomic parquet overwrites (save's multi-directory rewrite
    * is only atomic at the meta file; two writers on one directory could
    * serve a half-rewritten scan — review finding). A path hash joins the
    * sanitized name so distinct corpus roots that sanitize identically
    * ("/a/b" vs "/a_b") cannot share a directory. Within one session the
    * first entry run builds + saves and every later run loads — the
    * restart-reuse lifecycle itself is exercised by `AnnIndexIOSpec` and
    * the bench's ann_save/load/serve probes; a real deployment passes its
    * own durable single-writer `dir`. */
  def defaultDir(spark: SparkSession, sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_") +
      "_" + java.lang.Integer.toHexString(sfDir.hashCode)
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_ann_idx",
      org.apache.spark.sql.graft.ColumnBridge.sessionUUID(spark), safe).toString
  }

  /** Builds the residual-tier artifacts from the corpus parquet and
    * persists them under `dir` (replacing whatever was there). The corpus
    * listing is captured BEFORE the build: if the corpus changes while the
    * build runs, the saved fingerprint no longer matches and the next load
    * rebuilds — stale is inert, never wrong. Returns the artifacts
    * re-read FROM THE SAVED FILES, so the caller serves exactly what a
    * restarted process would. */
  def save(spark: SparkSession, dir: String, corpusPath: String): RpqArtifacts = {
    val df = spark.read.parquet(corpusPath)
    val listing = UWheelIndex.listingOfDf(df)
    require(listing.nonEmpty, s"$corpusPath is not a file-backed corpus")
    val fp = UWheelIndex.fingerprintOfListing(listing)
    val n = df.count()
    val art = SimilarityQueries.rpqArtifactsOf(SimilarityQueries.vecsOf(df), n)
    art.fines.write.mode("overwrite").parquet(s"$dir/fines")
    art.coarse.write.mode("overwrite").parquet(s"$dir/coarse")
    // codes partitioned by the derived pcell and sorted by cid within each
    // partition: a served query's probe set prunes unprobed PARTITIONS via
    // DPP, and the per-file cid min/max stats admit row-group pruning
    // inside a cell — the probe-bounded scan realized at the storage level
    art.codes.repartition(col("pcell")).sortWithinPartitions("cid")
      .write.mode("overwrite").partitionBy("pcell").parquet(s"$dir/codes_base")
    writeMeta(dir, AnnMeta(FormatVersion, corpusPath, fp, listing, n,
      SimilarityQueries.RpqM, art.ks, art.cents, Seq("codes_base")))
    // best-effort cleanup of delta directories from a previous lifecycle:
    // the fresh meta references only codes_base, so stale codes_delta_*
    // dirs (earlier refreshes of a corpus this rebuild replaced, or a
    // refresh that crashed before its meta commit) are unreachable — but
    // they'd still occupy disk and over-count any du-style accounting
    // forever (review finding). Runs AFTER the meta commit: a failure
    // here leaves harmless orphans, never a broken index.
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("codes_delta_"))
      .foreach { d =>
        try {
          val ds = Files.walk(d.toPath)
          try ds.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
          finally ds.close()
        } catch { case _: java.io.IOException => () }
      }
    load(spark, dir)._1
  }

  /** Loads the persisted artifacts plus their meta. Freshness is the
    * CALLER's check ([[isFresh]]) — load itself is pure deserialization so
    * ops tooling can inspect a stale index without a corpus in reach. */
  def load(spark: SparkSession, dir: String): (RpqArtifacts, AnnMeta) = {
    val meta = readMeta(dir)
    val fines = spark.read.parquet(s"$dir/fines")
    val coarse = spark.read.parquet(s"$dir/coarse")
    // each code directory is its own pcell-partitioned table root — read
    // separately and union (one multi-root read trips Spark's conflicting-
    // directory-structures guard on partitioned layouts); unionByName
    // because the partition column's position differs from the in-memory
    // frame's
    val codes = meta.codeDirs
      .map(d => spark.read.parquet(s"$dir/$d"))
      .reduce(_.unionByName(_))
    (RpqArtifacts(fines, coarse, codes, meta.cents, meta.ks, meta.n), meta)
  }

  /** Whether the saved index still matches the corpus' CURRENT listing. */
  def isFresh(spark: SparkSession, meta: AnnMeta): Boolean =
    scala.util.Try {
      UWheelIndex.fingerprintOfDf(spark.read.parquet(meta.corpusPath)) ==
        meta.fingerprint
    }.getOrElse(false)

  /** The serve entry point: a fresh saved index loads (paying
    * deserialization + two small parquet reads, never the corpus encode);
    * anything else — missing, unreadable, stale, or built over a different
    * corpus path — rebuilds and re-saves. Never serves stale artifacts. */
  def loadFreshOrRebuild(
      spark: SparkSession, dir: String, corpusPath: String): RpqArtifacts = {
    val loaded = scala.util.Try {
      val (art, meta) = load(spark, dir)
      if (meta.corpusPath == corpusPath && isFresh(spark, meta)) Some(art)
      else None
    }.toOption.flatten
    loaded.getOrElse(save(spark, dir, corpusPath))
  }

  /** Append-only refresh: encodes files added to the corpus since the last
    * save/refresh against the FROZEN hierarchy + codebook and appends
    * their codes as a new delta directory. Returns the number of newly
    * indexed vectors (0 when the listing is unchanged). A changed or
    * deleted indexed file throws — the saved codes for it can't be
    * repaired incrementally, and serving around the mismatch would be
    * silently wrong; rebuild instead. */
  def refresh(spark: SparkSession, dir: String): Long = {
    val meta = readMeta(dir)
    val df = spark.read.parquet(meta.corpusPath)
    val current = UWheelIndex.listingOfDf(df)
    val currentByPath = current.map(f => f._1 -> f).toMap
    val broken = meta.files.filterNot(f => currentByPath.get(f._1).contains(f))
    if (broken.nonEmpty)
      throw new IllegalStateException(
        s"ANN refresh is append-only: ${broken.size} indexed file(s) changed or " +
          s"vanished (e.g. ${broken.head._1}) — rebuild the index")
    val known = meta.files.map(_._1).toSet
    val fresh = current.filterNot(f => known(f._1))
    if (fresh.isEmpty) return 0L
    val (art, _) = load(spark, dir)
    val newVecs = SimilarityQueries.vecsOf(spark.read.parquet(fresh.map(_._1): _*))
    val added = newVecs.count()
    val newFp = UWheelIndex.fingerprintOfListing(current)
    // delta dir named by the TARGET fingerprint: a refresh that crashed
    // after writing parquet but before the meta commit re-runs into the
    // same directory with overwrite semantics — idempotent, no duplicates
    val deltaDir = f"codes_delta_${newFp}%016x"
    SimilarityQueries.rpqEncodeFrozen(art, newVecs)
      .repartition(col("pcell")).sortWithinPartitions("cid")
      .write.mode("overwrite").partitionBy("pcell").parquet(s"$dir/$deltaDir")
    writeMeta(dir, meta.copy(fingerprint = newFp, files = current,
      n = meta.n + added, codeDirs = meta.codeDirs :+ deltaDir))
    added
  }
}
