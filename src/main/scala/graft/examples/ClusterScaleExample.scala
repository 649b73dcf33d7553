package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries

/** Scale probe for the clustering fixpoint: a 1M-node PATH (diameter 10⁶ —
  * the adversarial shape for one-hop label propagation, which would need a
  * million rounds) plus 500k random extra edges. The alternating
  * large-star/small-star contraction must finish in ~O(log n) rounds with
  * one single-component answer.
  *
  * Run: `sbt "runMain graft.examples.ClusterScaleExample [nodes]"`
  */
object ClusterScaleExample {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = spark.range(n - 1).select(col("id").as("i"), (col("id") + 1).as("j"))
    val rand = spark.range(n / 2).select(
      pmod(hash(col("id")), lit(n)).cast("long").as("i"),
      pmod(hash(col("id") * 7 + 3), lit(n)).cast("long").as("j"))
    val t = System.nanoTime()
    val (df, rounds) = PipelineQueries.connectedComponentsWithRounds(path.union(rand))
    val rows = df.collect()
    val logBound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(n)) + 4
    println(f"nodes=$n edges=${n - 1 + n / 2} rounds=$rounds " +
      f"clusters=${rows.length} largest=${rows.map(_.getLong(1)).max} " +
      f"time=${(System.nanoTime() - t) / 1e9}%.1f s")
    require(rows.length == 1 && rows.head.getLong(1) == n,
      s"path+extras must collapse to ONE $n-member cluster, got ${rows.toSeq}")
    require(rounds <= logBound, s"$rounds rounds exceeds the O(log n) bound $logBound")
    spark.stop()
  }
}
