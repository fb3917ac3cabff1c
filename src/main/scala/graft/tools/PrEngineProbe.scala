package graft.tools

import org.apache.spark.sql.functions._

/** A/B probe: relational PageRank.run vs PageRankCsr on the frozen
  * bench graph (fromLineitem v=50k), warmup + 2 timed passes each.
  * Diagnostic only — not part of the driver contract.
  */
object PrEngineProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.graph.Edges.fromLineitem(spark, dir, 50000L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = e.count()
    val ids = e.select(col("src").as("id")).union(e.select(col("dst")))
      .distinct()
    val nReal = ids.count()
    val maxId = e.agg(max(greatest(col("src"), col("dst")))).head().getLong(0)
    println(s"edges=$m vertices=$nReal maxId=$maxId dense=${nReal == maxId + 1}")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // relational engine (current bench path)
    def rel(): Unit = {
      val r = graft.algos.PageRank.runUndirected(spark, e,
        graft.algos.PageRank.Config(tol = 1e-6, maxIter = 60))
      r.ranks.count()
      println(s"  rel iters=${r.iterations} err=${r.err}")
    }
    // CSR broadcast-vector engine
    def csr(): Unit = {
      val r = graft.algos.PageRankCsr.run(spark, e, maxIter = 60, tol = 1e-6)
      r.ranks.count()
      println(s"  csr iters=${r.iterations} err=${r.err}")
    }
    rel() // warm
    time("rel pass1")(rel())
    time("rel pass2")(rel())
    csr() // warm
    time("csr pass1")(csr())
    time("csr pass2")(csr())
    // parity
    val a = graft.algos.PageRank.runUndirected(spark, e,
      graft.algos.PageRank.Config(tol = 1e-6, maxIter = 60)).ranks
      .withColumnRenamed("rank", "ra")
    val b = graft.algos.PageRankCsr.run(spark, e, maxIter = 60, tol = 1e-6)
      .ranks.withColumnRenamed("rank", "rb")
    val d = a.join(b, "id")
      .agg(max(abs(col("ra") - col("rb"))), count(lit(1))).head()
    println(s"parity maxAbsDiff=${d.getDouble(0)} joinedRows=${d.getLong(1)}")
    spark.stop()
  }
}
