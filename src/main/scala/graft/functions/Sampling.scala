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

  /** Bucket 0..99 from the id, computed as
    * `((id mod P) · (K mod P)) mod P mod 100` — mathematically identical to
    * `(id·K) mod P` but with both factors < 2^20 the product stays exact in
    * 64-bit for EVERY id (the direct form overflows silently in Spark and
    * errors in checked-arithmetic engines once id ≥ ~3.5e9 — i.e. exactly
    * at the 10^12-row scale this function is documented for). */
  def bucket(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(Mod)) * lit(Knuth % Mod), lit(Mod)) % lit(100L)

  /** The overflow-safe Knuth-hash ordering key `(id mod P)·(K mod P) mod P`
    * (same caveat as [[bucket]]) — used where a deterministic pseudo-random
    * ORDER over ids is needed (e.g. the k-means seed). */
  def orderKey(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(Mod)) * lit(Knuth % Mod), lit(Mod))

  /** 'train' (80%), 'val' (10%), 'test' (10%). */
  def split(id: Column): Column =
    when(bucket(id) < 80, "train").when(bucket(id) < 90, "val").otherwise("test")
}
