package graft

import graft.graph.{CsrBlocks, Edges}

class CsrSpec extends SparkSuite {

  test("CSR blocks: degrees match the relational degree computation") {
    val e = graft.generators.Generators.er(spark, 150, 0.05, 11)
    val blocks = CsrBlocks.build(spark, e)
    val fromCsr = CsrBlocks.degrees(spark, blocks)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromSql = Edges.degrees(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromCsr == fromSql)
  }

  test("CSR SpMV with ones equals degrees; with ranks equals gather sum") {
    val e = edgesOf(K4 ++ Seq((3L, 4L)))
    val blocks = CsrBlocks.build(spark, e)
    val verts = Edges.vertices(e).collect().map(_.getLong(0))
    val ones = verts.map(_ -> 1.0).toMap
    val y = CsrBlocks.spmvBroadcast(spark, blocks, ones)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val deg = Edges.degrees(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    assert(y == deg)
    // arbitrary x: compare against the join+agg gather
    val x = verts.map(v => v -> (1.0 + v * 0.5)).toMap
    val y2 = CsrBlocks.spmvBroadcast(spark, blocks, x)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = {
      import spark.implicits._
      val xdf = x.toSeq.toDF("nbr", "xv")
      Edges.neighbors(e).join(xdf, "nbr").groupBy("id")
        .agg(org.apache.spark.sql.functions.sum("xv").as("y")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    y2.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 1e-12, s"vertex $k")
    }
  }
}
