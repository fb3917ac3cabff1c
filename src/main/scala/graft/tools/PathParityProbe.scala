package graft.tools

import org.apache.spark.sql.functions._

/** Scratch parity check at real testdata scale: the gated driver-local
  * path-centrality kernels must be VALUE-IDENTICAL to the distributed
  * plans on the exact q_betweenness / q_closeness driver inputs —
  * `runMain graft.tools.PathParityProbe [sfDir]`.
  */
object PathParityProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.graph.Edges.fromLineitem(spark, dir, 1000L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcs = graft.graph.Edges.vertices(e).where(col("id") < 8)
      .select(col("id").as("s"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bL = asMap(graft.algos.ApproxBetweenness.run(spark, e, k = 8,
      explicitSources = Some(srcs), portableSum = true))
    val bD = asMap(graft.algos.ApproxBetweenness.run(spark, e, k = 8,
      explicitSources = Some(srcs), portableSum = true, localNbrRowCap = 0))
    val cL = asMap(graft.algos.ApproxCloseness.run(spark, e, k = 8,
      explicitSources = Some(srcs)))
    val cD = asMap(graft.algos.ApproxCloseness.run(spark, e, k = 8,
      explicitSources = Some(srcs), localNbrRowCap = 0))
    require(bL.keySet == bD.keySet && cL.keySet == cD.keySet, "vertex sets differ")
    val bBad = bL.count { case (id, v) => v != bD(id) }
    val cBad = cL.count { case (id, v) => v != cD(id) }
    println(s"betweenness: ${bL.size} vertices, $bBad mismatches")
    println(s"closeness:   ${cL.size} vertices, $cBad mismatches")
    require(bBad == 0 && cBad == 0, "local/distributed parity violated")
    println("PARITY-" + "OK")
    spark.stop()
  }
}
