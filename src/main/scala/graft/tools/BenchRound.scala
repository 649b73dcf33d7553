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
  /** The repo root every bench tool resolves records against: the canonical
    * working directory — the SAME root `graft.Bench` writes its full record
    * to, so the round scanned here and the file written there can never
    * disagree when the tools run from different directories (round-15
    * advice: this used to hard-code one machine's layout). */
  def repoRoot: java.io.File = new java.io.File(".").getCanonicalFile

  def current: Int =
    sys.env.get("SPARK_GRAFT_ROUND").flatMap(_.trim.toIntOption).getOrElse {
      val prev = Option(repoRoot.listFiles()).getOrElse(Array.empty)
        .flatMap(f =>
          "^BENCH_r(\\d+)\\.json$".r.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      if (prev.isEmpty) 1 else prev.max + 1
    }
}
