package graft

import org.apache.spark.sql.functions._

import graft.algos.PageRank

/** Optimization-round-6 routing contracts: PageRank.runUndirected's
  * "auto" engine must pick the CSR broadcast-vector plan exactly when
  * it is provably equivalent (dense ids, broadcastable V, no
  * checkpoint/salt/explicit-partitioning), fall back to the relational
  * plan otherwise, and agree with it numerically either way.
  */
class Round6Spec extends SparkSuite {

  test("auto engine routes dense small graphs to csr") {
    val e = edgesOf(K8) // ids 0..7, dense
    val r = PageRank.runUndirected(spark, e)
    assert(r.engine == "csr")
    // same chain as the relational engine
    val rel = PageRank.runUndirected(spark, e,
      PageRank.Config(engine = "rel"))
    assert(rel.engine == "rel")
    val relM = rel.ranks.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.ranks.collect().foreach { x =>
      assert(math.abs(relM(x.getLong(0)) - x.getDouble(1)) < 1e-12)
    }
  }

  test("auto engine falls back to relational on sparse id spaces") {
    // ids {0, 2, 4, 6}: maxId+1 = 7 slots but only 4 vertices — the CSR
    // chain would use the wrong n (teleport base/init), so the route
    // must refuse
    val e = edgesOf(Seq((0L, 2L), (2L, 4L), (4L, 6L), (0L, 6L)))
    val r = PageRank.runUndirected(spark, e)
    assert(r.engine == "rel")
  }

  test("auto engine respects the broadcast vertex cap and pins") {
    val e = edgesOf(K8)
    // cap below maxId: must stay relational
    val capped = PageRank.runUndirected(spark, e,
      PageRank.Config(csrMaxVertices = 4L))
    assert(capped.engine == "rel")
    // checkpointed runs must stay on the resumable relational plan
    val dir = java.nio.file.Files.createTempDirectory("graft-r6-ckpt").toString
    val ck = PageRank.runUndirected(spark, e,
      PageRank.Config(maxIter = 2,
        checkpoint = Some(new graft.core.CheckpointManager(spark, dir))))
    assert(ck.engine == "rel")
  }
}
