package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph quality prior: PageRank over the out-link edges the
  * [[graft.html.Links]] extractor produces. Common-Crawl publishes exactly
  * this signal (its host-level PageRank/harmonic-centrality ranks) and
  * corpus pipelines use it as a keep/weight prior per page.
  *
  * EXACT INTEGER arithmetic throughout: ranks are scaled longs and every
  * step is integer add / floor-div. A distributed SUM of doubles is
  * order-dependent (partial aggregation order varies run to run), so a
  * float PageRank can never be hash-gated; integer addition is associative
  * and commutative, so this one is bit-reproducible on any partitioning —
  * the same trick the tf-idf integer surrogate and the SQ8 pool boundary
  * use. The floored divisions leak a few units of mass per node per round;
  * the signal is the RANKING, not the mass invariant, and the leak is
  * deterministic. */
object PageRank {

  /** Iterate `rank_{t+1}(v) = (scale*(100-d)/100)/N + (d * Σ_{u→v}
    * (rank_t(u) DIV outdeg(u))) DIV 100` from `rank_0 = scale/N` for a
    * FIXED number of rounds (the production shape: rank feeds a
    * keep-threshold, and a fixed-round integer fixpoint is reproducible
    * across reruns/backfills in a way "iterate to ε" float loops are not).
    *
    * Shape at 10^12 edges: `outdeg` is one map-side-combined aggregation
    * joined onto the cached edge table ONCE; each round is one shuffle —
    * the contribution sum groups by dst (partials combine: a node with
    * 10^9 in-links ships one row per map task) — plus a left join back to
    * the node table that reuses the groupBy's hash partitioning on v.
    * Round results are localCheckpoint'ed (constant-size plans; previous
    * round's blocks released immediately — the [[graft.dedup.Dedup]]
    * connectedComponents discipline; swap for checkpoint() on a real
    * cluster, same note as there).
    *
    * Returns (v, rank) for every node that appears as a source OR a
    * target (sinks get base mass; their received mass damps normally). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8, dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100,
      s"iterations=$iterations dampingPct=$dampingPct")
    graft.functions.Sampling.requireIntegral(edges, srcCol, "PageRank src")
    graft.functions.Sampling.requireIntegral(edges, dstCol, "PageRank dst")
    val e = edges.select(
        col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v")))
      .distinct().cache()
    val n = nodes.count()
    if (n == 0) {
      nodes.unpersist()
      return e.select(col("src").as("v"), lit(0L).as("rank"))
    }
    val withDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src").cache()
    val base = scale * (100 - dampingPct) / 100 / n
    var ranks: DataFrame = nodes.select(col("v"), lit(scale / n).as("r"))
    var lastCkpt: DataFrame = null
    for (t <- 1 to iterations) {
      val sums = withDeg
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), expr("r DIV outdeg").as("c"))
        .groupBy("v").agg(sum("c").as("s"))
      ranks = nodes.join(sums, Seq("v"), "left")
        .select(col("v"),
          expr(s"${base}L + ($dampingPct * coalesce(s, 0L)) DIV 100").as("r"))
      // Checkpoint every FOURTH round, not every round: `ranks` is
      // referenced once per round, so the plan grows linearly (unlike
      // connectedComponents' double reference), and each eager
      // localCheckpoint is a full job barrier — per-round checkpointing
      // made the 8-round fixpoint 8 sequential jobs dominated by
      // orchestration floor (measured 2x the whole-op wall). The final
      // round always checkpoints so the returned frame is materialized
      // before the caches below are released.
      if (t % 4 == 0 || t == iterations) {
        val ck = ranks.localCheckpoint() // eager: materialize + cut lineage
        if (lastCkpt != null) releaseLocalCheckpoint(lastCkpt)
        lastCkpt = ck
        ranks = ck
      }
    }
    // the final round is already-materialized checkpoint blocks with no
    // dependency on the caches; the ContextCleaner reclaims them when the
    // frame becomes unreachable
    nodes.unpersist()
    withDeg.unpersist()
    ranks.select(col("v"), col("r").as("rank"))
  }

  private def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
