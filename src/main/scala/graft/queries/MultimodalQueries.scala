package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, decoded by an imperative per-partition pass.
  *
  * The corpus has no real media files, so the payload is the document text's
  * UTF-8 bytes and the "decode" step is a clearly-marked deterministic stub
  * (a real deployment would swap [[MultimodalQueries.decodeStub]] for an
  * actual image/audio decoder). Everything around the stub — binary column
  * derivation, case-class schema, `mapPartitions` batch shape, ordering —
  * is the real distributed pipeline a media corpus needs.
  */
object MultimodalQueries {

  final case class DocBin(doc_id: Long, bin: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, mean_luma: Double)

  /** STUB decoder: derives deterministic fake media features from the raw
    * bytes. A real implementation would parse the container format here. */
  def decodeStub(d: DocBin): MediaMeta = {
    val n = d.bin.length
    val luma = d.bin.take(8).map(b => (b & 0xff).toLong).sum / 8.0
    MediaMeta(d.doc_id, n.toLong, 16 + n % 17, 16 + n % 13, 1 + n % 7, luma)
  }

  /** Typed per-partition decode pipeline over the fabricated binary column. */
  def pipeline(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    import spark.implicits._
    docBins(spark)
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy("doc_id")
  }

  final case class FrameSample(doc_id: Long, frame_idx: Int, byte_offset: Long, frame_bytes: Long)

  /** Frame sampling: every 2nd frame of each media payload, emitted as
    * (frame index, byte offset, span) — the imperative per-partition shape a
    * video pipeline uses to cut decode cost before feature extraction. The
    * frame geometry comes from the stub decoder; the byte arithmetic around
    * it (uniform spans at `len / n_frames`) is the real plumbing and has an
    * exact SQL oracle. */
  /** documents → typed binary payloads, shared by every imperative stage. */
  private def docBins(spark: SparkSession): org.apache.spark.sql.Dataset[DocBin] = {
    import spark.implicits._
    spark.table("documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      .as[DocBin]
  }

  def frames(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    import spark.implicits._
    docBins(spark)
      .mapPartitions(_.flatMap { d =>
        val meta = decodeStub(d)
        val span = d.bin.length.toLong / meta.n_frames
        (0 until meta.n_frames by 2).iterator
          .map(f => FrameSample(d.doc_id, f, f * span, span))
      })
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Declarative metadata extraction over the same binary column. */
  def meta(spark: SparkSession, sfDir: String): DataFrame =
    Q.ctx(spark, sfDir).sql(
      """SELECT doc_id,
        |  CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT) AS n_bytes,
        |  md5(text) AS sig
        |FROM documents ORDER BY doc_id""".stripMargin)

  val defs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "mm_meta" -> (meta _),
    "mm_pipeline" -> (pipeline _),
    "mm_frames" -> (frames _),
  )

  /** The stub decoder's features are pure integer/byte functions of the UTF-8
    * payload (all-ASCII corpus), so even the mapPartitions pipeline has an
    * exact SQL oracle. */
  val oracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS sig
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_pipeline" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(16 + octet_length(encode(text)) % 17 AS INT) AS width,
        |  CAST(16 + octet_length(encode(text)) % 13 AS INT) AS height,
        |  CAST(1 + octet_length(encode(text)) % 7 AS INT) AS n_frames,
        |  CAST(ascii(substring(text, 1, 1)) + ascii(substring(text, 2, 1))
        |     + ascii(substring(text, 3, 1)) + ascii(substring(text, 4, 1))
        |     + ascii(substring(text, 5, 1)) + ascii(substring(text, 6, 1))
        |     + ascii(substring(text, 7, 1)) + ascii(substring(text, 8, 1)) AS DOUBLE) / 8.0 AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n,
        |                  1 + octet_length(encode(text)) % 7 AS nf FROM documents)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |       CAST(f * (n // nf) AS BIGINT) AS byte_offset,
        |       CAST(n // nf AS BIGINT) AS frame_bytes
        |FROM m, unnest(range(0, nf, 2)) AS t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
