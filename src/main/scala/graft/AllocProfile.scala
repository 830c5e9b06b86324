package graft

import graft.pdf.{PdfExtract, WorkBuffers}
import graft.pipeline.Corpus

/** Dev tool: deterministic allocation profile of the extraction hot path,
  * per corpus variant — `com.sun.management.ThreadMXBean
  * .getThreadAllocatedBytes` over a single-threaded loop (phase-independent,
  * unlike wall-clock on this VM). Run with
  * `sbt "runMain graft.AllocProfile"`; prints bytes/doc per variant for the
  * full-text and the metrics-only (captureText=false) paths. The r2 work
  * measured 26.9 kB/doc on the plain corpus; this keeps that number
  * honest as variants/features land. */
object AllocProfile {
  def main(args: Array[String]): Unit = {
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val rnd = new scala.util.Random(11)
    val words = Array("key", "agg", "row", "scan", "slow", "fast", "table", "value", "part", "hash")
    def text(): String =
      Array.fill(300 + rnd.nextInt(200))(words(rnd.nextInt(words.length))).mkString(" ")
    val perVariant = (0 until Corpus.NumPdfVariants).map { v =>
      v -> Array.fill(500)(Corpus.pdfForDoc(v.toLong * 2, text()))
    }
    val buffers = new WorkBuffers()
    def measure(payloads: Array[Array[Byte]], captureText: Boolean): Double = {
      var sink = 0L
      // warm twice (JIT + buffer growth), then measure
      (1 to 2).foreach { _ =>
        payloads.foreach(p => sink += PdfExtract.extract(p, contentDelimiter = "",
          buffers = buffers, captureFragments = false, captureText = captureText).nChars)
      }
      val a0 = tmx.getThreadAllocatedBytes(tid)
      payloads.foreach(p => sink += PdfExtract.extract(p, contentDelimiter = "",
        buffers = buffers, captureFragments = false, captureText = captureText).nChars)
      val bytes = tmx.getThreadAllocatedBytes(tid) - a0
      if (sink == Long.MinValue) print("")
      bytes.toDouble / payloads.length
    }
    println(f"${"variant"}%-8s ${"full B/doc"}%12s ${"metrics B/doc"}%14s  payload B")
    perVariant.foreach { case (v, ps) =>
      val full = measure(ps, captureText = true)
      val metrics = measure(ps, captureText = false)
      val sz = ps.map(_.length.toLong).sum / ps.length
      println(f"v$v%-7s ${full}%12.0f ${metrics}%14.0f  $sz%9d")
    }
  }
}
