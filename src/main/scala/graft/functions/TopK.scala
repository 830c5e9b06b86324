package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-K-per-key as a typed combinable [[Aggregator]] — the
  * per-registrable-domain / per-host CAP of FineWeb-style pipelines (keep
  * only the K best documents of each host to fight SEO spam and domain
  * concentration), and the K>1 generalization of
  * [[graft.dedup.Dedup.keepBestPerKey]]'s argmax.
  *
  * Why an Aggregator and not a window: `row_number() OVER (PARTITION BY
  * host)` must SHUFFLE EVERY ROW of the corpus to its host's reducer
  * before it can rank (Spark's partial WindowGroupLimit helps but still
  * ships up to K·tasks rows per key AFTER a per-task sort of everything).
  * A combinable top-K buffer caps map-side state at K entries per key per
  * task, merges associatively, and ships exactly ≤K rows per key per task
  * through the one shuffle — at 10^12 rows and K=100 that is the
  * difference between shuffling the corpus and shuffling a rounding error
  * of it. This is also the library's demonstration of the typed
  * `Aggregator[IN, BUF, OUT]` extension point (SURVEY §2.4): everything
  * else is built-ins or Catalyst expressions.
  *
  * Ordering: score DESC, id ASC on ties — compared directly (never
  * negated, so `Long.MinValue` scores cannot overflow their way to the
  * top; the r4-ADVICE keepBest lesson applied from the start). */
object TopK {

  /** Buffers are best-first sorted, length ≤ k — the invariant `reduce`
    * and `merge` preserve, which is what makes the merge associative and
    * the result partitioning-independent. */
  private final class TopKAgg(k: Int)
      extends Aggregator[(String, Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private def better(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)
    override def zero: Seq[(Long, Long)] = Nil
    override def reduce(b: Seq[(Long, Long)], a: (String, Long, Long)): Seq[(Long, Long)] =
      merge(b, Seq((a._2, a._3)))
    override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      // classic sorted merge, truncated at k (both inputs hold the invariant)
      val out = Vector.newBuilder[(Long, Long)]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < x.length || j < y.length)) {
        val takeX = j >= y.length ||
          (i < x.length && better(x(i)._1, x(i)._2, y(j)._1, y(j)._2))
        if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
        n += 1
      }
      out.result()
    }
    override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** `(key, rank 1..k, id, score)` — the ≤k best rows per key by
    * (score DESC, id ASC). `keyCol` must be a string (hosts, languages,
    * shards); `scoreCol`/`idCol` must be integral (the same lossy-cast
    * guard as packing/mixing). */
  def topKPerKey(df: DataFrame, keyCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(df.schema(keyCol).dataType == org.apache.spark.sql.types.StringType,
      s"topKPerKey key column '$keyCol' must be a string, got " +
        df.schema(keyCol).dataType)
    Sampling.requireIntegral(df, scoreCol, "topKPerKey")
    Sampling.requireIntegral(df, idCol, "topKPerKey")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKAgg(k)
    df.select(col(keyCol), col(scoreCol).cast("long"), col(idCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("top"))
      .flatMap { case (key, top) =>
        top.iterator.zipWithIndex.map { case ((score, id), i) =>
          (key, i + 1L, id, score)
        }
      }
      .toDF(keyCol, "rank", idCol, scoreCol)
  }
}
