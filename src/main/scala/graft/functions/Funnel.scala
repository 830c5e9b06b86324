package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed keep/drop POLICY of a web-corpus quality pipeline: every
  * document gets a verdict naming the FIRST filter stage that rejects it
  * (or `kept`), in the published stage order of RefinedWeb/FineWeb-style
  * pipelines (Penedo et al. 2023/2024): URL blocklist → language check →
  * Gopher document-quality rules (Rae et al. 2021 §A1.1) → repetition
  * filter. Data teams monitor exactly this attrition-with-reasons surface
  * (what fraction did each rule cost?), and the per-doc verdict is the
  * reproducible audit trail for why a document is absent from a corpus.
  * ADDITIVE surface composed from this library's gated signals — the
  * stages can never drift from the individually-gated operators because
  * they ARE those operators' expressions.
  *
  * Shape at 10^12 docs: stages 1–3 are the signals' own shapes — the
  * blocklist check is the suffix-explode + broadcast semi-join of
  * [[Urls.dropBlockedDomains]] (the corpus never shuffles for it; only the
  * matched ids do), language and Gopher rules are fully codegen'd per-row
  * Columns — and stage 4 joins [[TextStats.repetitionSignals]]'s per-doc
  * aggregate back on the id (that operator's two map-side-combined
  * explode→agg chains are the funnel's only corpus shuffles). First-fail
  * semantics cost nothing extra: one CASE over the assembled flags. */
object Funnel {

  /** Funnel stages in order; verdicts are these plus `kept`. */
  val Stages: Seq[String] =
    Seq("blocked_url", "wrong_lang", "gopher_fail", "repetitive")

  /** `(doc_id, verdict)` — verdict is the first failing stage or `kept`.
    * `blocklist` carries registrable domains in `domainCol` (subdomain
    * matches included). `langCol` is the EXPECTED language; a document
    * whose [[TextStats.langId]] prediction disagrees is `wrong_lang`.
    * `maxDupBigramPermille` drops documents whose duplicate-bigram
    * fraction (per mille) reaches the threshold. */
  def verdicts(docs: DataFrame, idCol: String, urlCol: String,
      langCol: String, textCol: String,
      blocklist: DataFrame, domainCol: String = "domain",
      minWords: Int = 50, maxDupBigramPermille: Long = 200L): DataFrame = {
    val blockedIds = docs
      .select(col(idCol).as("_bid"),
        explode(Urls.domainSuffixes(Urls.hostOf(col(urlCol)))).as("_sfx"))
      .join(broadcast(blocklist.select(lower(col(domainCol)).as("_sfx"))),
        Seq("_sfx"), "left_semi")
      .select("_bid").distinct()
      .withColumn("_blocked", lit(true))
    val rep = TextStats.repetitionSignals(docs, idCol, textCol)
      .select(col("doc_id").as("_rid"), col("dup_bigram_permille"))
    docs
      .join(blockedIds, col(idCol) === col("_bid"), "left_outer")
      .join(rep, col(idCol) === col("_rid"), "left_outer")
      .select(col(idCol).as("doc_id"),
        when(col("_blocked"), lit("blocked_url"))
          // null/empty text must fail CLOSED: every later stage's predicate
          // goes null on null text, and when(null) falls through — without
          // this guard an extraction-failed document would be "kept"
          .when(col(textCol).isNull || length(trim(col(textCol))) === 0,
            lit("gopher_fail"))
          .when(TextStats.langId(col(textCol)) =!= col(langCol), lit("wrong_lang"))
          .when(TextStats.gopherSignals(col(textCol), minWords)
            .getField("keep") === 0, lit("gopher_fail"))
          .when(coalesce(col("dup_bigram_permille"), lit(0L))
            .geq(maxDupBigramPermille), lit("repetitive"))
          .otherwise(lit("kept")).as("verdict"))
  }

  /** Attrition report over a [[verdicts]] result: one row per stage (plus
    * `kept`) with `n_dropped` and `n_remaining` after that stage, in
    * funnel order — stages that dropped nothing still appear with 0. The
    * input aggregates to ≤ 5 rows before any window runs, so the
    * single-partition cumulative sum is report-sized, never
    * corpus-sized. */
  def report(verdicts: DataFrame, verdictCol: String = "verdict"): DataFrame = {
    val spark = verdicts.sparkSession
    import spark.implicits._
    val stages = (Stages :+ "kept").zipWithIndex
      .map { case (s, i) => (s, i.toLong) }.toDF("stage", "stage_idx")
    val counts = verdicts.groupBy(col(verdictCol).as("stage"))
      .agg(count(lit(1)).as("n"))
    val all = Window.partitionBy(lit(1))
    val cum = Window.partitionBy(lit(1)).orderBy("stage_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    broadcast(stages).join(counts, Seq("stage"), "left_outer")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("n_dropped", when(col("stage") === "kept", 0L).otherwise(col("n")))
      .withColumn("n_remaining",
        sum(col("n")).over(all) - sum(col("n_dropped")).over(cum))
      .select(col("stage_idx"), col("stage"), col("n_dropped"), col("n_remaining"))
      .orderBy("stage_idx")
  }
}
