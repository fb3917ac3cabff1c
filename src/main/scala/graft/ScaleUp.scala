package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10x scale-up of a driver testdata directory — the
  * input for the sf1 bench point (BASELINE.md r4): every scale claim
  * before round 4 extrapolated from sf0.1, this makes one measured 10x
  * point.
  *
  * Each fact table is unioned `copies` times with per-copy KEY SHIFTS by
  * large primes, so modulo-derived graphs get fresh residues per copy
  * (the edge space actually grows ~10x instead of collapsing in the
  * canonical dedup), join keys stay consistent across tables
  * (orderkey/custkey/partkey shifted by the same offset everywhere),
  * documents get per-copy text markers (no artificial cross-copy
  * near-dup explosion), and embeddings a per-copy epsilon (no identical
  * vectors). Dimension tables (nation/region/supplier) stay single-copy
  * exactly like TPC-H scaling does.
  *
  * Run: sbt "runMain graft.ScaleUp [srcDir] [outDir] [copies]"
  */
object ScaleUp {

  // distinct large primes: c*OFF mod v cycles through fresh residues
  val OrderOff = 1000000007L
  val PartOff = 998244353L
  val CustOff = 479001599L
  val UserOff = 1000003L
  val DocOff = 100000007L
  val VecOff = 100003L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft-sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String, tf: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val u = (0 until copies).map(c => tf(base, c)).reduce(_ unionAll _)
      u.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name x$copies -> $out/$name.parquet")
    }
    def asIs(name: String): Unit = write(name, (df, _) => df)

    write("lineitem", (df, c) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(c * OrderOff))
      .withColumn("l_partkey", col("l_partkey") + lit(c * PartOff)))
    write("orders", (df, c) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(c * OrderOff))
      .withColumn("o_custkey", col("o_custkey") + lit(c * CustOff)))
    write("customer", (df, c) => df
      .withColumn("c_custkey", col("c_custkey") + lit(c * CustOff)))
    write("part", (df, c) => df
      .withColumn("p_partkey", col("p_partkey") + lit(c * PartOff)))
    write("documents", (df, c) => df
      .withColumn("doc_id", col("doc_id") + lit(c * DocOff))
      .withColumn("text",
        if (c == 0) col("text") else concat(col("text"), lit(s" copy$c"))))
    // copies get a deterministic per-(vector, copy, dim) SIGN SCRAMBLE,
    // not an epsilon shift: an epsilon-shifted copy is a near-duplicate
    // of its original (cosine ~ 1), which would plant ~copies^2/2 true
    // near-dup pairs per base vector and quadratically inflate the
    // near-dup WORKLOAD itself rather than scaling the corpus
    write("embeddings", (df, c) => df
      .withColumn("vec_id", col("vec_id") + lit(c * VecOff))
      .withColumn("embedding",
        if (c == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          x * when(pmod(xxhash64(col("vec_id"), lit(c), i), lit(2)) === 0,
            lit(1.0f)).otherwise(lit(-1.0f)))))
    write("events", (df, c) => df
      .withColumn("event_id", col("event_id") + lit(c * OrderOff))
      .withColumn("user_id", col("user_id") + lit(c * UserOff)))
    Seq("nation", "region", "supplier").foreach(asIs)
    spark.stop()
  }
}
