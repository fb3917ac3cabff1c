package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, retry-safe randomness for distributed generation.
  *
  * The reference derives all stochastic structure from seeded numpy /
  * networkx generators (/root/reference/graphem/generators.py:48,94-95).
  * Spark's `rand()` is NOT reproducible across task retries or
  * partitioning changes, so every "random" quantity in this engine is a
  * pure function of (row identity, seed) via xxhash64 — identical on
  * local[8], local[32], and a 1000-executor cluster.
  */
object DetRandom {

  private val Mask52 = (1L << 52) - 1
  private val Inv52 = 1.0 / (1L << 52).toDouble

  /** Uniform double in [0, 1) as a pure function of (seed, cols*). */
  def uniform(seed: Long, cols: Column*): Column =
    (xxhash64((lit(seed) +: cols): _*).bitwiseAND(lit(Mask52)))
      .cast("double") * lit(Inv52)

  /** Uniform long in [0, n) as a pure function of (seed, cols*). */
  def uniformLong(seed: Long, n: Long, cols: Column*): Column =
    pmod(xxhash64((lit(seed) +: cols): _*), lit(n))

  /** Deterministic Bernoulli(p). */
  def bernoulli(p: Double, seed: Long, cols: Column*): Column =
    uniform(seed, cols: _*) < lit(p)

  /** A stable 64-bit hash of arbitrary columns (for sampling order,
    * salting, fingerprints).
    */
  def hash64(seed: Long, cols: Column*): Column =
    xxhash64((lit(seed) +: cols): _*)

  /** Driver-local replica of `uniform(seed, lit(id))` for the
    * small-graph fast paths: Spark's xxhash64 chains XXH64.hashLong
    * over the row's fields starting from seed 42, so the column and
    * this function produce IDENTICAL doubles for the same (seed, id).
    */
  def uniformLocal(seed: Long, id: Long): Double = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    (XXH64.hashLong(id, XXH64.hashLong(seed, 42L)) & Mask52) * Inv52
  }
}
