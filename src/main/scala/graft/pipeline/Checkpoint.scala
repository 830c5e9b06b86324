package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}

/** Resumable runs: a per-partition done-manifest (url + partition + counts)
  * written alongside the output; resuming a job is a broadcastable left-anti
  * join of the input against the manifest, so a re-submitted 10^12-row job
  * re-reads only undone work. This models Iceberg snapshot/commit semantics
  * with plain parquet (no Iceberg runtime jar in this sandbox — see
  * SURVEY.md §7); swapping in a real catalog is a `TableIO` config change.
  *
  * The north_rule's "checkpoints per-partition with lineage + metrics" maps
  * to: manifest rows carry (url, spark_partition_id, n_chars,
  * decode_failures) — enough to resume, attribute output to input splits,
  * and roll up run metrics without re-reading the output table.
  */
object Checkpoint {

  def manifestPath(outDir: String): String = s"$outDir/_manifest"

  /** Append the done-manifest for a completed batch of extracted docs. */
  def commit(done: Dataset[ExtractedDoc], outDir: String): Unit = {
    val spark = done.sparkSession
    import org.apache.spark.sql.functions._
    done
      .select(col("url"), col("n_chars"), col("decode_failures"))
      .withColumn("part_id", spark_partition_id())
      .write.mode(SaveMode.Append).parquet(manifestPath(outDir))
  }

  /** Rows of `pages` not yet present in the manifest. Left-anti on `url`;
    * the manifest side is small relative to the input and broadcast-eligible
    * per AQE, so resume adds no full shuffle of the page table. */
  def resume(pages: Dataset[PageRow], outDir: String): Dataset[PageRow] = {
    val spark = pages.sparkSession
    val done = doneUrls(spark, outDir)
    done match {
      case Some(d) => pages.join(d, Seq("url"), "left_anti").as[PageRow](pages.encoder)
      case None    => pages
    }
  }

  def doneUrls(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(manifestPath(outDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(manifestPath(outDir)).select("url").distinct())
    else None
  }

  /** Run-level metrics rollup from the manifest (docs, chars, failures). */
  def metrics(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(manifestPath(outDir))
      .agg(
        count(lit(1)).as("docs_done"),
        sum("n_chars").as("total_chars"),
        sum("decode_failures").as("total_decode_failures"))
  }
}
