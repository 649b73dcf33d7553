package graft.tools

/** The round number a bench record files under. An explicit
  * `SPARK_GRAFT_ROUND` wins — set it when invoking any bench tool outside
  * the normal order. Otherwise the round is inferred as 1 + the highest
  * committed `BENCH_r{N}.json`, which ASSUMES the tool runs BEFORE the
  * driver bench writes the current round's file: run the scale/dedup
  * probes before `graft.Bench` (or pin the env var), or the record lands
  * under the NEXT round's filename and mislabels the evidence (review
  * finding). Within a round, re-runs refresh the same file in place. */
object BenchRound {
  def current: Int =
    sys.env.get("SPARK_GRAFT_ROUND").flatMap(_.trim.toIntOption).getOrElse {
      val repo = new java.io.File("/root/repo")
      val prev = Option(repo.listFiles()).getOrElse(Array.empty)
        .flatMap(f =>
          "^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      if (prev.isEmpty) 1 else prev.max + 1
    }
}
