package graft.html

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-target anchor-text profile over the `(dst, anchor)` edges
  * [[Links.extractAnchors]] emits: for every link target, how often the
  * rest of the web links to it, with how many distinct anchor strings, and
  * which anchor string is most common. Anchor text is the classic external
  * page-description signal (Craswell et al., SIGIR 2001 — anchors beat
  * page content for site finding); corpus pipelines use the profile as a
  * quality prior and as query/title training targets for retrieval models.
  * ADDITIVE surface — the reference has no HTML code.
  *
  * Shape at 10^12 edges: two aggregations (the wide first one hash-based,
  * the struct-buffered argmax sort-based — PLANS.md §anchor_profile), both
  * with map-side partial combine, and never a per-target list. A
  * `collect_list(anchor)`
  * profile would materialize a hub page's whole in-link set in one task
  * (a 10^9-in-link hub = task OOM, and a skew straggler long before
  * that); instead the first `groupBy(dst, anchor)` collapses duplicate
  * anchor strings map-side — boilerplate anchors ("click here", the
  * page's title) dominate real in-link sets, so the second shuffle
  * carries distinct-(dst, anchor) rows only. The top-anchor argmax rides
  * `min(struct(-cnt, anchor))`, whose partials combine and whose
  * lexicographic tie-break keeps the result partitioning-independent
  * (`cnt` is a non-negative count, so the negation is exact — no
  * fractional or MinValue edge as in keep-best-per-key's score rank). */
object Anchors {

  /** `(dst, n_refs, n_anchors, top_anchor)` — in-link count, distinct
    * anchor-string count, and the most frequent anchor string (ties break
    * to the lexicographically smallest) per link target. */
  def profile(edges: DataFrame, dstCol: String, anchorCol: String): DataFrame = {
    val counts = edges
      .groupBy(col(dstCol).as("dst"), col(anchorCol).as("anchor"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .groupBy("dst")
      .agg(
        sum("cnt").as("n_refs"),
        count(lit(1)).as("n_anchors"),
        min(struct((-col("cnt")).as("neg_cnt"), col("anchor").as("anchor"))).as("best"))
      .select(col("dst"), col("n_refs"), col("n_anchors"),
        col("best.anchor").as("top_anchor"))
  }
}
