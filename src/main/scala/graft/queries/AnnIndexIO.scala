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
  * Layout under an index directory (artifact dirs are versioned by build
  * GENERATION and only the atomically-replaced meta points at the live
  * ones, so a crashed rebuild can never leave a fresh-looking meta over
  * partially rewritten parquet):
  * {{{
  *   ann_meta.bin         java-serialized [[AnnMeta]], written atomically
  *                        (temp + ATOMIC_MOVE) LAST in every mutation
  *   fines_g<gen>/        parquet (cid, vc, nc, ccid) — ~√n rows
  *   coarse_g<gen>/       parquet (ccid, vcc, ncc)   — ~∜n rows
  *   codes_base_g<gen>/   parquet (xi, cid, nx, codes) — ONE row per corpus
  *   codes_delta_<fp>/    vector: the 16-byte residual code + stored norm
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

  private val FormatVersion = 2

  /** Everything small enough to belong in one atomically-replaced file:
    * corpus identity (path + listing + fingerprint), trained-corpus size
    * `n`, geometry, the residual codebook, the build GENERATION the
    * artifact directories are versioned by, the ordered list of code
    * directories (base + deltas), and the CALIBRATED serve-time nprobe
    * ([[graft.queries.SimilarityQueries.calibrateNprobe]]) — the operating
    * point is trained state, frozen with the codebook; a rebuild
    * re-calibrates, a refresh (frozen-artifact contract) does not. */
  @SerialVersionUID(2L)
  private[graft] final case class AnnMeta(
      version: Int,
      corpusPath: String,
      fingerprint: Long,
      files: Seq[(String, Long, Long)],
      n: Long,
      m: Int,
      ks: Int,
      cents: Array[Double],
      gen: Long,
      fineDir: String,
      coarseDir: String,
      codeDirs: Seq[String],
      nprobeCal: Int,
      // r18 serve-path optimization: the artifact/corpus schemas AS SAVED
      // (DDL strings, keys "corpus"/"fines"/"coarse"/"codes") — a load
      // that provides the schema skips parquet schema inference, which
      // costs ONE SCHEDULED JOB per spark.read.parquet (profiled: 4 jobs
      // ≈ 130 ms of the served entry's per-run cost; at scale, schema
      // from the catalog — not footer inference — is the standard serve
      // shape anyway). Same pinned SerialVersionUID: metas written before
      // this field deserialize with null and fall back to inference.
      schemaDdl: Map[String, String] = null) extends Serializable

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
    val e = SimilarityQueries.vecsOf(df)
    val art = SimilarityQueries.rpqArtifactsOf(e, n)
    // every rebuild writes into a FRESH generation's directories and the
    // committed meta is the only pointer to them: a crash mid-write leaves
    // the previous generation fully intact behind its still-valid meta —
    // never a fresh-looking meta over partially rewritten parquet (a
    // re-save over an UNCHANGED corpus used to overwrite codes_base in
    // place under the old, still-fingerprint-fresh meta — review finding).
    // The generation counter (not a timestamp) keeps a crashed save's
    // re-run idempotent: it re-targets the same uncommitted directories.
    val gen = (try Some(readMeta(dir)) catch { case _: Throwable => None })
      .map(_.gen + 1).getOrElse(0L)
    val fineDir = s"fines_g$gen"
    val coarseDir = s"coarse_g$gen"
    val codesDir = s"codes_base_g$gen"
    art.fines.write.mode("overwrite").parquet(s"$dir/$fineDir")
    art.coarse.write.mode("overwrite").parquet(s"$dir/$coarseDir")
    // codes partitioned by the derived pcell and sorted by cid within each
    // partition: a served query's probe set prunes unprobed PARTITIONS via
    // DPP, and the per-file cid min/max stats admit row-group pruning
    // inside a cell — the probe-bounded scan realized at the storage level
    art.codes.repartition(col("pcell")).sortWithinPartitions("cid")
      .write.mode("overwrite").partitionBy("pcell").parquet(s"$dir/$codesDir")
    // calibrate the serve-time nprobe on the artifacts AS SAVED (what a
    // restarted process serves), with the corpus and codes pinned in
    // memory across the ladder's production searches
    val savedArt = readArtifacts(spark, dir, fineDir, coarseDir, Seq(codesDir),
      art.cents, art.ks, n, nprobeCal = None)
    val ep = e.persist()
    val cp = savedArt.codes.persist()
    val (nprobeCal, ladder) =
      try SimilarityQueries.calibrateNprobe(savedArt, ep)
      finally { ep.unpersist(); cp.unpersist() }
    if (ladder.nonEmpty)
      println(s"[graft] ann nprobe calibration n=$n: " +
        ladder.map { case (np, r) => f"np$np=$r%.3f" }.mkString(" ") +
        s" -> serving nprobe=$nprobeCal (formula floor ${
          SimilarityQueries.nprobeFor(n)})")
    // schemas AS READ BACK from the saved parquet (not the in-memory
    // frames') so later schema-provided loads see byte-identical types
    val ddl = Map(
      "corpus" -> df.schema.toDDL,
      "fines" -> savedArt.fines.schema.toDDL,
      "coarse" -> savedArt.coarse.schema.toDDL,
      "codes" -> savedArt.codes.schema.toDDL)
    writeMeta(dir, AnnMeta(FormatVersion, corpusPath, fp, listing, n,
      SimilarityQueries.RpqM, art.ks, art.cents, gen, fineDir, coarseDir,
      Seq(codesDir), nprobeCal, ddl))
    // best-effort cleanup of directories no generation references anymore:
    // superseded generations' artifacts, stale deltas, and v1-layout dirs
    // are unreachable after the meta commit — but they'd still occupy disk
    // and over-count any du-style accounting forever (review finding).
    // Runs AFTER the commit: a failure here leaves harmless orphans,
    // never a broken index.
    val live = Set(fineDir, coarseDir, codesDir)
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !live(f.getName) &&
        Seq("fines", "coarse", "codes_base", "codes_delta_")
          .exists(f.getName.startsWith))
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

  /** The artifact frames for explicit directory names — the shared read
    * path of [[load]] and save's post-write calibration. */
  private def readArtifacts(spark: SparkSession, dir: String,
      fineDir: String, coarseDir: String, codeDirs: Seq[String],
      cents: Array[Double], ks: Int, n: Long,
      nprobeCal: Option[Int],
      schemaDdl: Map[String, String] = null): RpqArtifacts = {
    // provided schemas (saved in the meta) skip the per-directory schema-
    // inference job; a meta without them (pre-r18 files) infers as before
    def reader(key: String) = {
      val ddl = Option(schemaDdl).flatMap(_.get(key))
      ddl.fold(spark.read)(d => spark.read.schema(
        org.apache.spark.sql.types.StructType.fromDDL(d)))
    }
    // r19 (verdict item 3): the ≤ √n fine centroids are collected ONCE per
    // load into a LocalRelation + driver rows — every search over loaded
    // artifacts used to re-run a parquet-scan collect of this frame per
    // query; now probe ranking reads driver state and the frame itself is a
    // plan constant (the in-memory build path's shape)
    val (fines, fineRows) =
      SimilarityQueries.localizeFines(reader("fines").parquet(s"$dir/$fineDir"))
    val coarse = reader("coarse").parquet(s"$dir/$coarseDir")
    // each code directory is its own pcell-partitioned table root — read
    // separately and union (one multi-root read trips Spark's conflicting-
    // directory-structures guard on partitioned layouts); unionByName
    // because the partition column's position differs from the in-memory
    // frame's
    val codes = codeDirs
      .map(d => reader("codes").parquet(s"$dir/$d"))
      .reduce(_.unionByName(_))
    RpqArtifacts(fines, coarse, codes, cents, ks, n, nprobeCal, Some(fineRows))
  }

  /** Loads the persisted artifacts plus their meta. Freshness is the
    * CALLER's check ([[isFresh]]) — load reads only index state (meta +
    * one bounded ≤ √n fine-centroid collect), never the corpus, so ops
    * tooling can inspect a stale index without a corpus in reach. */
  def load(spark: SparkSession, dir: String): (RpqArtifacts, AnnMeta) = {
    val meta = readMeta(dir)
    (readArtifacts(spark, dir, meta.fineDir, meta.coarseDir, meta.codeDirs,
      meta.cents, meta.ks, meta.n, Some(meta.nprobeCal), meta.schemaDdl), meta)
  }

  /** The corpus frame under the meta's saved schema when present (skips
    * the schema-inference job — the fingerprint needs only the LISTING,
    * which the relation provides without reading any data). */
  private def corpusDf(spark: SparkSession, meta: AnnMeta) =
    Option(meta.schemaDdl).flatMap(_.get("corpus"))
      .fold(spark.read)(d => spark.read.schema(
        org.apache.spark.sql.types.StructType.fromDDL(d)))
      .parquet(meta.corpusPath)

  /** Whether the saved index still matches the corpus' CURRENT listing. */
  def isFresh(spark: SparkSession, meta: AnnMeta): Boolean =
    scala.util.Try {
      UWheelIndex.fingerprintOfDf(corpusDf(spark, meta)) == meta.fingerprint
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
    val df = corpusDf(spark, meta)
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
    // vec_id disjointness: an appended file that REUSES an indexed id
    // would put duplicate xi rows across codes_base and the delta and
    // double-count n, silently duplicating served candidates (review
    // finding) — fail loud like the append-only gate. One broadcast-able
    // semi-join of the (small) append against the code tier.
    val clash = art.codes.select(col("xi").as("vec_id"))
      .join(newVecs.select("vec_id"), Seq("vec_id"), "left_semi")
      .limit(1).collect()
    if (clash.nonEmpty)
      throw new IllegalStateException(
        s"ANN refresh requires fresh vec_ids: appended file(s) reuse indexed " +
          s"id ${clash.head.getLong(0)} — duplicate ids would double-count " +
          "served candidates; rebuild instead")
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
