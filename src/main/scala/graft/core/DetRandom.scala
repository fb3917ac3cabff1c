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
}
