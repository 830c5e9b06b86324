package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every engine
  * that can do 64-bit integer arithmetic assigns the same split to the same
  * id — no RNG state, no engine-specific hash. Knuth multiplicative hash on
  * the id, bucketed 0..99; split by cumulative bucket ranges.
  *
  * At 10^12 rows this is a stateless narrow map (no shuffle, no sampling
  * pass), and the assignment is stable under re-runs, repartitioning, and
  * backfills — the property that matters for reproducible train/test
  * separation. */
object Sampling {

  final val Knuth = 2654435761L
  final val Mod = 1000003L // prime > 100 buckets, small enough for exact SQL

  /** Bucket 0..99 from the id. `pmod((id * K) % P, 100)` — both factors
    * exact in 64-bit, so any SQL engine reproduces it. */
  def bucket(id: Column): Column =
    pmod(pmod(id.cast("long") * Knuth, lit(Mod)), lit(100L))

  /** 'train' (80%), 'val' (10%), 'test' (10%). */
  def split(id: Column): Column =
    when(bucket(id) < 80, "train").when(bucket(id) < 90, "val").otherwise("test")
}
