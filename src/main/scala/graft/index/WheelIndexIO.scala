package graft.index

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Paths}

/** Persistence for built indexes, so a restarted service re-registers its
  * wheels instead of re-scanning the table (the reference keeps wheels
  * in-memory only and rebuilds on every process start,
  * `datafusion-uwheel/src/lib.rs:92-122`).
  *
  * Safety: the saved [[TableIndex]] carries the build-time file-listing
  * fingerprint, and the optimizer rule re-fingerprints the table's CURRENT
  * listing on every lookup — a loaded index over data that changed since
  * the save is inert (no rewrites, queries fall back to scans), never
  * silently wrong. [[load]] also reports that staleness eagerly so callers
  * can schedule a rebuild.
  */
object WheelIndexIO {

  /** Serializes a built index (all wheels + metadata) to `file`. */
  def save(t: TableIndex, file: String): Unit = {
    val out = new ObjectOutputStream(Files.newOutputStream(Paths.get(file)))
    try out.writeObject(t) finally out.close()
  }

  /** Loads and registers a saved index. Returns the index and whether it is
    * still fresh (fingerprint matches the table's current file listing —
    * in-memory-built indexes with fingerprint 0 are always "fresh": their
    * staleness is governed by ExprId identity instead). */
  def load(spark: org.apache.spark.sql.SparkSession, file: String): (TableIndex, Boolean) = {
    val in = new ObjectInputStream(Files.newInputStream(Paths.get(file)))
    val t = try in.readObject().asInstanceOf[TableIndex] finally in.close()
    WheelRegistry.register(t)
    val fresh = t.fingerprint == 0L || {
      graft.Tables.ensureNanosConf(spark)
      scala.util.Try {
        spark.read.parquet(t.pathKey).queryExecution.analyzed.collectFirst {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation
        } match {
          case Some(h: org.apache.spark.sql.execution.datasources.HadoopFsRelation) =>
            UWheelIndex.fingerprintOf(h.location) == t.fingerprint
          case _ => false
        }
      }.getOrElse(false)
    }
    (t, fresh)
  }
}
