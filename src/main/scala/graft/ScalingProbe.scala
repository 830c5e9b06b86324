package graft

import graft.pipeline.Corpus
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Scaling-efficiency DECOMPOSITION probe: attributes the lo→hi-thread
  * efficiency gap of the extraction pipeline to named, individually measured
  * terms. The north_rule's ≥0.8 criterion is defined for N→4N *executors*
  * (each node bringing its own memory system); on this single box all
  * 32 threads share one memory bus, so the honest question is: how much of
  * the measured gap is (a) hardware (turbo clocks), (b) memory-bus/allocation
  * contention of the parse stack itself — both of which exist with or
  * without Spark — and (c) Spark overhead (scan, scheduling, task
  * granularity), which is the only part that would also hurt a real
  * cluster scale-out.
  *
  * Five experiments, each a paired lo/hi measurement (same discipline as
  * [[Bench]]: back-to-back tiers per round, mean-of-3 walls after warm-up,
  * median round by efficiency):
  *
  *  - `cpu_alu`        — pure-ALU LCG loop: the turbo-clock ceiling. No
  *                        memory traffic, no Spark.
  *  - `parse_nospark`  — the REAL parse stack (PdfExtract + Boilerplate)
  *                        over the bench corpus' payload bytes held in
  *                        memory, plain threads. Adds the parse stack's
  *                        memory/allocation behavior; still no Spark.
  *  - `spark_tmpfs`    — the metrics-rollup Spark job with the corpus on
  *                        tmpfs (/dev/shm): adds Spark scan + scheduling,
  *                        REMOVES storage I/O entirely.
  *  - `spark_tmpfs_fanout` — same job over a REWRITTEN copy of the corpus
  *                        with 4·cores files (the bench corpus is 64
  *                        single-row-group files, so no maxPartitionBytes
  *                        value can yield more than 64 real tasks — splits
  *                        past a row-group boundary are empty): isolates
  *                        task-granularity effects with a true ≥4 tasks/core
  *                        at the hi tier.
  *  - `spark_disk`     — the standard Bench tier (disk parquet, page-cache
  *                        pre-read): adds the OS file path back.
  *
  * Reading the output: if eff(spark_tmpfs) ≈ eff(parse_nospark), Spark adds
  * no scaling penalty of its own — the residual vs cpu_alu is the memory
  * bus, which a multi-node scale-out does not share. Any gap between
  * spark_* and parse_nospark is real Spark overhead to fix. Results are
  * recorded in BASELINE.md §scaling-decomposition.
  */
object ScalingProbe {

  // timing estimator shared with Bench (Bench.meanOf3): the probe's whole
  // point is decomposing the bench's number, so the discipline must match
  private def meanOf3(f: => Unit): Double = Bench.meanOf3(f)

  private final case class Pair(tLo: Double, tHi: Double, ratio: Double) {
    def eff: Double = (tLo / tHi) / ratio
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repl = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPL", "16").toInt
    val textRep = sys.env.getOrElse("SPARK_GRAFT_BENCH_TEXTREP", "8").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "5").toInt
    val loCores = math.max(1, cpus / 4)

    // ---- corpus (reuses Bench's on-disk cache) + an in-memory payload copy
    val boot = Bench.session(cpus)
    val diskDir = Bench.corpusDir(boot, sfDir, repl, textRep)
    val payloads: Array[(Boolean, Array[Byte])] = {
      import boot.implicits._
      Bench.pagesOf(boot, diskDir)
        .map(p => (Corpus.isPdfDoc(p.url.substring(Corpus.UrlPrefix.length).toLong), p.html))
        .collect()
    }
    val nDocs = payloads.length
    val totalBytes = payloads.iterator.map(_._2.length.toLong).sum
    boot.stop()

    // ---- tmpfs copy (ramdisk: no storage I/O in the scan path). Guarded by
    // a _PROBE_COMPLETE marker, written only after a staging-dir copy is
    // atomically renamed into place: a probe killed mid-copy must not leave
    // a partial directory that later runs silently measure as the corpus
    // (a subset corpus skews every spark_* attribution term while
    // parse_nospark still sees all docs).
    val tmpfsBase = Paths.get("/dev/shm")
    val tmpfsDir = tmpfsBase.resolve(s"graft_probe_${Integer.toHexString(diskDir.hashCode)}")
    def deleteTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(Files.delete(_))
      finally walk.close()
    }
    if (!Files.exists(tmpfsDir.resolve("_PROBE_COMPLETE"))) {
      deleteTree(tmpfsDir) // partial dir from a killed run
      val staging = tmpfsBase.resolve(tmpfsDir.getFileName.toString + ".staging")
      deleteTree(staging)
      Files.createDirectories(staging)
      val files = Files.list(Paths.get(diskDir))
      try files.forEach { f =>
        Files.copy(f, staging.resolve(f.getFileName.toString), StandardCopyOption.REPLACE_EXISTING)
      } finally files.close()
      Files.createFile(staging.resolve("_PROBE_COMPLETE"))
      Files.move(staging, tmpfsDir, StandardCopyOption.ATOMIC_MOVE)
    }

    val ratio = cpus.toDouble / loCores
    // the measured wall is INSIDE the session (after a codegen warm-up run),
    // so session start/stop never pollutes a tier
    def sparkTier(dir: String, maxPartitionBytes: Long, cores: Int): Double = {
      val s = Bench.session(cores, maxPartitionBytes)
      val p = Bench.pagesOf(s, dir)
      Bench.runMetricsJob(p)
      val t = meanOf3(Bench.runMetricsJob(p))
      s.stop()
      t
    }
    def sparkPair(dir: String, maxPartitionBytes: Long = -1): Pair = {
      Bench.preReadCorpus(dir)
      Pair(sparkTier(dir, maxPartitionBytes, loCores),
        sparkTier(dir, maxPartitionBytes, cpus), ratio)
    }
    // scan-only job: parquet decode + binary column materialization, no
    // parse — isolates how the SCAN path itself scales within spark_tmpfs
    def scanTier(dir: String, cores: Int): Double = {
      val s = Bench.session(cores)
      def job(): Unit = {
        s.read.parquet(dir)
          .agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.length(
              org.apache.spark.sql.functions.col("html")))).collect(); ()
      }
      job()
      val t = meanOf3(job())
      s.stop()
      t
    }
    def scanPair(dir: String): Pair = {
      Bench.preReadCorpus(dir)
      Pair(scanTier(dir, loCores), scanTier(dir, cpus), ratio)
    }
    val diskBytes = {
      val fs = new java.io.File(diskDir).listFiles()
      if (fs == null) 0L else fs.filter(_.isFile).map(_.length).sum
    }
    // fan-out corpus: the same rows REWRITTEN as 4·cores files on tmpfs.
    // maxPartitionBytes cannot deliver the claimed >=4 tasks/core here —
    // the bench corpus is 64 files of ONE row group each, and a split that
    // contains no row-group midpoint is an empty task — so task granularity
    // must come from the file count. Same staging-marker discipline as the
    // corpus copy above.
    val fanFiles = 4 * cpus
    val fanDir = tmpfsBase.resolve(tmpfsDir.getFileName.toString + "_fan")
    if (!Files.exists(fanDir.resolve("_PROBE_COMPLETE"))) {
      deleteTree(fanDir)
      val staging = tmpfsBase.resolve(fanDir.getFileName.toString + ".staging")
      deleteTree(staging)
      val s = Bench.session(cpus)
      s.read.parquet(tmpfsDir.toString).repartition(fanFiles)
        .write.mode("overwrite").parquet(staging.toString)
      s.stop()
      Files.createFile(staging.resolve("_PROBE_COMPLETE"))
      Files.move(staging, fanDir, StandardCopyOption.ATOMIC_MOVE)
    }

    // warm everything once (JIT of the parse stack over all variants,
    // codegen, tmpfs page entries) before any accepted round
    Bench.cpuCeiling(cpus); Bench.pureParse(payloads, cpus); Bench.pureParse(payloads, loCores)
    sparkPair(tmpfsDir.toString)

    // ---- rounds: each round interleaves ALL experiments back-to-back, so
    // the attribution ratios (which divide one experiment's efficiency by
    // another's) compare measurements from the SAME hardware phase — the
    // VM's minute-scale turbo/co-tenancy drift otherwise lands in the terms.
    // Efficiency algebra: every experiment does fixed total work, so wall ∝
    // 1/(threads·per-thread-rate) and (tLo/tHi)/(hi/lo) is the per-core
    // retention going lo→hi.
    val names = Seq("cpu_alu", "parse_nospark", "spark_scan_tmpfs", "spark_tmpfs",
      "spark_tmpfs_fanout", "spark_disk")
    val roundsData: Seq[Map[String, Pair]] = (1 to rounds).map { _ =>
      Map(
        "cpu_alu" -> Pair(meanOf3(Bench.cpuCeiling(loCores)), meanOf3(Bench.cpuCeiling(cpus)), ratio),
        "parse_nospark" -> Pair(meanOf3(Bench.pureParse(payloads, loCores)),
          meanOf3(Bench.pureParse(payloads, cpus)), ratio),
        "spark_scan_tmpfs" -> scanPair(tmpfsDir.toString),
        "spark_tmpfs" -> sparkPair(tmpfsDir.toString),
        "spark_tmpfs_fanout" -> sparkPair(fanDir.toString),
        "spark_disk" -> sparkPair(diskDir))
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    // REJECTION: a round any of whose walls deviates >1.75x from that
    // experiment+tier's pool median was measured in a degraded VM phase
    // (co-tenant burst, turbo collapse — one probe run recorded the ALU
    // ceiling falling 0.84 → 0.38 across three rounds); its ratios would
    // poison the attribution. Fall back to all rounds if <2 survive.
    def consistent(r: Map[String, Pair]): Boolean = names.forall { n =>
      def ok(x: Double, m: Double) = x / m <= 1.75 && m / x <= 1.75
      ok(r(n).tLo, median(roundsData.map(_(n).tLo))) &&
        ok(r(n).tHi, median(roundsData.map(_(n).tHi)))
    }
    val accepted = roundsData.filter(consistent)
    val used = if (accepted.size >= 2) accepted else roundsData
    def fmt(x: Double) = f"$x%.3f"
    def expJson(name: String) = {
      val ps = used.map(_(name))
      val m = ps.sortBy(_.eff).apply(ps.size / 2)
      val all = roundsData.map { r =>
        val p = r(name)
        s"""{"t_lo":${fmt(p.tLo)},"t_hi":${fmt(p.tHi)},"efficiency":${fmt(p.eff)},"accepted":${consistent(r)}}"""
      }
      s""""$name":{"t_lo":${fmt(m.tLo)},"t_hi":${fmt(m.tHi)},"efficiency":${fmt(m.eff)},""" +
        s""""rounds":${all.mkString("[", ",", "]")}}"""
    }
    // attribution: per-round ratios of successive efficiencies (same-phase),
    // median across accepted rounds. Multiplying turbo × mem_bus ×
    // spark_overhead recovers that round's spark_tmpfs efficiency exactly.
    def term(num: String, den: String): Double =
      median(used.map(r => r(num).eff / r(den).eff))
    println(
      s"""{"metric":"scaling_decomposition","sf":"$sfDir","docs":$nDocs,"bytes":$totalBytes,"disk_bytes":$diskBytes,""" +
        s""""cores_lo":$loCores,"cores_hi":$cpus,"fanout_files":$fanFiles,""" +
        s""""rounds_total":${roundsData.size},"rounds_accepted":${accepted.size},""" +
        names.map(expJson).mkString(",") + "," +
        s""""attribution":{"turbo_ceiling":${fmt(median(used.map(_("cpu_alu").eff)))},""" +
        s""""mem_bus_and_alloc":${fmt(term("parse_nospark", "cpu_alu"))},""" +
        s""""spark_overhead":${fmt(term("spark_tmpfs", "parse_nospark"))},""" +
        s""""scan_path_eff":${fmt(median(used.map(_("spark_scan_tmpfs").eff)))},""" +
        s""""fanout_gain":${fmt(term("spark_tmpfs_fanout", "spark_tmpfs"))},""" +
        s""""io_path":${fmt(term("spark_disk", "spark_tmpfs"))}}}""")
  }
}
