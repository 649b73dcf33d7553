package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory: wheel-index rewrites (R1–R7),
  * delegated relational breadth (joins/windows/set-ops/scalar fns), and the
  * training-pipeline operators (dedup, similarity search, text analysis,
  * multimodal plumbing). Each entry with an `oracleSql` twin is compared
  * value-for-value against DuckDB by the driver; entries without one (the
  * engine-hash-dependent LSH/SimHash/IVF ops) get a rows-only check.
  */
object SparkEntry {

  /** Flagship: wheel-indexed temporal COUNT answered at plan time. */
  def entry(spark: SparkSession): DataFrame =
    WheelQueries.defs.head._2(spark, "/root/testdata/sf0.001")

  // a def: SimilarityQueries.oracles mirrors the served ANN entry's
  // calibrated operating point, known only after the queries have run
  def modules: Seq[(Seq[(String, (SparkSession, String) => DataFrame)], Map[String, String])] =
    Seq(
      (WheelQueries.defs, WheelQueries.oracles),
      (RelationalQueries.defs, RelationalQueries.oracles),
      (TextQueries.defs, TextQueries.oracles),
      (SimilarityQueries.defs, SimilarityQueries.oracles),
      (PipelineQueries.defs, PipelineQueries.oracles),
      (MultimodalQueries.defs, MultimodalQueries.oracles),
    )

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_._1).toMap

  /** Equivalent ANSI SQL runnable by DuckDB on the same parquet tables. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_._2).toMap
}
