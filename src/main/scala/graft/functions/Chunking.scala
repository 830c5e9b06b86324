package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-token-window document chunking with overlap — the standard
  * preparation for embedding/retrieval indexes (RAG corpora): each document
  * becomes `ceil((n - W) / S) + 1` chunks of up to `W` whitespace tokens,
  * consecutive chunks sharing `W - S` tokens of overlap so no semantic unit
  * is cut without appearing whole in a neighbor. The sibling of
  * [[graft.pipeline.Packing.packSequences]] (which packs documents INTO
  * fixed budgets for training); this SPLITS documents into overlapping
  * windows for indexing.
  *
  * Built entirely from codegen'd Catalyst functions (`split`/`sequence`/
  * `explode`/`slice`/`array_join`) — a per-row explode with ZERO shuffles
  * at any corpus size; output volume is input tokens × W/S, linear in the
  * corpus. ADDITIVE surface: the reference is a single-document parser. */
object Chunking {

  /** `(doc_id, chunk_idx, n_tokens, chunk)` — `chunk_idx` ordinal per
    * document, `n_tokens` the chunk's actual token count (only the final
    * chunk may be short). Documents with no tokens produce no chunks.
    * `overlapTokens` must be < `windowTokens` (the stride `W - overlap`
    * must advance). */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, overlapTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens=$windowTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < windowTokens,
      s"overlapTokens=$overlapTokens must be in [0, windowTokens)")
    val stride = windowTokens - overlapTokens
    val w = col("__w")
    val n = size(w)
    // chunk count: 1 for n <= W, else ceil((n - W) / S) + 1 via integer
    // arithmetic — the last chunk starts at exactly n - W when (n - W) is a
    // multiple of S, so no window ever starts past the end
    val nChunks = when(n <= windowTokens, lit(1L))
      .otherwise(floor((n - windowTokens + (stride - 1)).cast("long") / stride) + 1L)
    docs
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("__w"))
      .select(col("doc_id"), w,
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(windowTokens), n - col("chunk_idx") * stride).cast("long").as("n_tokens"),
        array_join(slice(w, (col("chunk_idx") * stride + 1).cast("int"), lit(windowTokens)), " ")
          .as("chunk"))
  }
}
