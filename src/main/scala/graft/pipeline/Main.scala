package graft.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit entry point for the extraction pipeline:
  *
  * {{{
  * spark-submit --class graft.pipeline.Main pdfparserspark.jar \
  *   <inputTable> <outDir> [--delimiter D] [--partitions N] [--no-resume]
  *   [--maintenance] [--delta prevSnapshot]
  * }}}
  *
  * `--delta <prevSnapshot>` runs the INCREMENTAL recrawl path: both tables
  * are fingerprinted (md5 of the raw html payload — extraction-relevant
  * bytes only, never fetch metadata), [[Recrawl.delta]] classifies every
  * url, the status counts are printed, and ONLY added+changed documents
  * flow into the normal resume → salt → extract → commit path. On a real
  * monthly recrawl the unchanged fraction dominates, so this is the
  * difference between re-extracting the whole 10^12-row table and a few
  * percent of it.
  *
  * Reads the input_hint page table (parquet path or Iceberg-style table
  * path), skips urls already present in `<outDir>/_manifest` (resume),
  * salts against document-size skew, extracts, writes the output table and
  * appends the per-partition checkpoint manifest, then prints a one-line
  * metrics rollup. Designed so a killed run re-submitted with the same
  * arguments continues mid-table (north_rule: resumable with per-partition
  * lineage + metrics).
  *
  * `--maintenance` skips extraction and instead runs the sink maintenance
  * pair on `<outDir>` — [[Checkpoint.compact]] (small-file rewrite, under
  * the maintenance lock) then [[Checkpoint.vacuum]] (orphan + crashed-
  * staging GC) — and prints what it did. `<inputTable>` is ignored but
  * still required positionally so the submit command only changes by the
  * flag.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    require(pos.length >= 2, "usage: Main <inputTable> <outDir> [--delimiter D] [--partitions N] [--no-resume] [--maintenance] [--delta prevSnapshot]")
    val (input, outDir) = (pos(0), pos(1))
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }
    val delimiter = opt("delimiter").getOrElse("")
    val resume = !args.contains("--no-resume")

    if (args.contains("--stream")) {
      // REAL micro-batch streaming run (round 5): the streaming MinHash
      // near-dup detector driven end-to-end through readStream →
      // flatMapGroupsWithState → writeStream under spark-submit, across
      // MULTIPLE triggers (maxFilesPerTrigger=1 over a 4-file staging of
      // the input, Trigger.AvailableNow), then a batch-parity assertion:
      // the accumulated, exact-verified stream output must equal
      // Dedup.minhashDedupPairs over the same corpus. `<inputTable>` is a
      // documents parquet (doc_id, text); everything is written under
      // `<outDir>`.
      runStream(input, outDir)
      return
    }

    if (args.contains("--maintenance")) {
      val spark = SparkSession.builder().appName("graft-maintenance").getOrCreate()
      val compacted = Checkpoint.compact(spark, outDir)
      val vacuumed = Checkpoint.vacuum(spark, outDir)
      println(s"""{"compacted":${compacted.map("\"" + _ + "\"").getOrElse("null")},""" +
        s""""vacuumed":[${vacuumed.map("\"" + _ + "\"").mkString(",")}]}""")
      spark.stop()
      return
    }

    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", 64)
      .config("spark.sql.columnVector.offheap.enabled", "true")
      .getOrCreate()
    val partitions = opt("partitions").map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism * 2)

    val t0 = System.nanoTime() // job time: resume + extract + metrics + commit
    val allPages = TableIO.readPages(spark, input)
    // incremental recrawl: shrink the work list to added+changed urls before
    // the (per-output) resume filter — the two compose: delta skips content
    // the PREVIOUS SNAPSHOT already had, resume skips urls THIS OUTPUT
    // already extracted
    val deltaCached = opt("delta").map { prevPath =>
      val fpOf = (t: org.apache.spark.sql.DataFrame) =>
        t.select(col("url"), md5(col("html")).as("fp"))
      val d = Recrawl.delta(
        fpOf(TableIO.readPages(spark, prevPath).toDF()),
        fpOf(allPages.toDF()), "url", "fp").persist()
      val counts = d.groupBy("status").count().collect()
        .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted.mkString(",")
      println(s"""{"mode":"delta","statuses":{$counts}}""")
      d
    }
    val pages = deltaCached match {
      case Some(d) =>
        import org.apache.spark.sql.Encoders
        Recrawl.toExtract(allPages.toDF(), d, "url")
          .as[PageRow](Encoders.product[PageRow])
      case None => allPages
    }
    val todo = if (resume) Checkpoint.resume(pages, outDir) else pages
    val extracted = ExtractPipeline
      .run(ExtractPipeline.salted(todo, partitions), delimiter)
      .persist()

    // one metrics job over the persisted batch; its docs count also gates
    // the commit so a fully-resumed (empty) run commits nothing and idle
    // re-submissions don't accumulate empty batch directories
    val m = extracted.agg(
      count(lit(1)).as("docs"),
      coalesce(sum("n_chars"), lit(0L)).as("chars"),
      coalesce(sum("decode_failures"), lit(0L)).as("decode_failures"),
      coalesce(sum(when(col("kind") === "pdf", 1L).otherwise(0L)), lit(0L)).as("pdf_docs"))
      .collect().head
    // single atomic commit: data staged + renamed, then the manifest rename
    // as the commit point — a crash at any moment leaves either nothing or
    // an unmanifested (invisible, re-extracted) orphan, never duplicates
    if (m.getLong(0) > 0) Checkpoint.commitWithData(extracted, outDir)
    deltaCached.foreach(_.unpersist())
    val wall = (System.nanoTime() - t0) / 1e9
    println(s"""{"docs":${m.getLong(0)},"chars":${m.getLong(1)},""" +
      s""""decode_failures":${m.getLong(2)},"pdf_docs":${m.getLong(3)},"resumed":$resume,""" +
      s""""wall_sec":${f"$wall%.2f"}}""")
    spark.stop()
  }

  private def runStream(input: String, outDir: String): Unit = {
    import graft.dedup.Dedup
    import graft.streaming.StreamMinhash
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = SparkSession.builder()
      .appName("graft-stream")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(input)
      .select(col("doc_id").cast("long").as("doc_id"), col("text").cast("string").as("text"))
    // a PRIOR run's sink/checkpoint must not leak into this one: the
    // overwrite below writes uniquely-named part files, so a retained
    // checkpoint would treat them as unseen and the sink would accumulate
    // BOTH runs' pairs — stale pairs from a different corpus could then
    // flip the parity verdict either way
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
    Seq("stream_in", "stream_out", "stream_ckpt").foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$outDir/$d"), true))
    val staged = s"$outDir/stream_in"
    docs.repartition(4).write.mode("overwrite").parquet(staged)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one file per micro-batch → ≥4 triggers
      .parquet(staged)
      .as[(Long, String)]
    val query = StreamMinhash.candidatePairs(StreamMinhash.bandedStream(streamIn))
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$outDir/stream_out")
      .option("checkpointLocation", s"$outDir/stream_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val batches = query.recentProgress.length

    // parity: exact-verify the accumulated candidates; must equal the batch
    // operator's output on the same corpus. The explicit schema keeps a
    // ZERO-candidate corpus working — its sink dir holds only
    // _spark_metadata and schema inference would throw before parity prints
    val sinkSchema = StructType(Seq(
      StructField("id_a", LongType), StructField("id_b", LongType)))
    val streamPairs = Dedup.verifyCandidatesExact(docs, "doc_id", "text",
        spark.read.schema(sinkSchema).parquet(s"$outDir/stream_out")
          .select("id_a", "id_b"))
      .select("id_a", "id_b")
    val batchPairs = Dedup.minhashDedupPairs(docs, "doc_id", "text")
      .select("id_a", "id_b")
    val nStream = streamPairs.count()
    val nBatch = batchPairs.count()
    val diff = streamPairs.exceptAll(batchPairs).count() +
      batchPairs.exceptAll(streamPairs).count()
    println(s"""{"mode":"stream","micro_batches":$batches,"stream_pairs":$nStream,""" +
      s""""batch_pairs":$nBatch,"diff":$diff,"parity":${diff == 0 && nStream == nBatch}}""")
    spark.stop()
    if (diff != 0) sys.exit(1)
  }
}
