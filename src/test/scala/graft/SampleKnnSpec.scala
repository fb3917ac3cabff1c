package graft

import org.apache.spark.sql.functions._

import graft.functions.{BoundedTopKAgg, SampleKnn}

/** The fused multi-query kNN aggregate vs the crossJoin + per-query
  * bounded-heap plan it replaced: same candidates, same distances, same
  * (d2, j_eid) order — on random inputs with planted ties.
  */
class SampleKnnSpec extends SparkSuite {

  test("sample_knn == crossJoin + bounded_top_k, distances bit-equal") {
    import spark.implicits._
    val d = 3
    val rnd = new scala.util.Random(7)
    // points include EXACT duplicates (ties in d2 resolved by j_eid)
    val base = (0L until 400L).map { i =>
      (i, Array.fill(d)(math.rint(rnd.nextDouble() * 8) / 4.0))
    }
    val pts = base ++ base.take(25).map { case (i, v) => (i + 400L, v.clone()) }
    val ptsDf = pts.toDF("eid", "mid")
      .select(col("eid"), col("mid").cast("array<double>").as("mid"))
      .repartition(5).persist()
    ptsDf.count()
    val queries = pts.filter(_._1 % 37 == 0)
    val k = 6

    // reference plan: materialized candidates through BoundedTopKAgg
    val qDf = queries.toDF("i_eid", "imid")
      .select(col("i_eid"), col("imid").cast("array<double>").as("imid"))
    val sqdist = (0 until d).map { j =>
      val diff = element_at(col("imid"), j + 1) - element_at(col("mid"), j + 1)
      diff * diff
    }.reduce(_ + _)
    val expected = ptsDf.crossJoin(broadcast(qDf))
      .select(col("i_eid"), struct(sqdist.as("d2"), col("eid").as("j_eid")).as("cand"))
      .groupBy(col("i_eid"))
      .agg(BoundedTopKAgg.topK(col("cand"), k).as("nn"))
      .select(col("i_eid"), posexplode(col("nn")))
      .select(col("i_eid"), col("pos"), col("col.d2"), col("col.j_eid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

    val qids = queries.map(_._1).toArray
    val qvecs = queries.map(_._2).toArray
    val actual = ptsDf
      .agg(SampleKnn.knn(col("mid"), col("eid"), qids, qvecs, k).as("all"))
      .select(explode(col("all")).as("e"))
      .select(col("e.i_eid").as("i_eid"), posexplode(col("e.nn")))
      .select(col("i_eid"), col("pos"), col("col.d2"), col("col.j_eid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

    assert(actual.length == expected.length && actual.length == queries.length * k)
    actual.zip(expected).foreach { case (a, e) => assert(a == e, s"$a != $e") }
    ptsDf.unpersist()
  }

  test("fused bruteForceTopK == crossJoin + round + bounded heap, bit-equal micros") {
    import spark.implicits._
    val d = 8
    val rnd = new scala.util.Random(11)
    val base = (0L until 300L).map { i =>
      (i, Array.fill(d)(math.rint(rnd.nextDouble() * 20 - 10) / 4.0))
    }
    // planted hazards: exact duplicates (cosine ties on distinct ids)
    // and a zero vector (0.0 score under the VecCosine contract)
    val vecs = (base ++ base.take(10).map { case (i, v) => (i + 300L, v.clone()) } :+
      ((310L, Array.fill(d)(0.0)))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .repartition(4).persist()
    vecs.count()
    val q = vecs.where(col("vec_id") % 29 === 0)
    val k = 5

    // the replaced column plan, verbatim
    val qf = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cf = vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = cf.crossJoin(broadcast(qf))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.VecCosine(col("qv"), col("cv")) * 1e6, 0)
          .cast("long").as("cosine_micro"))
    val cand = struct((-col("cosine_micro").cast("double")).as("negcos"),
      col("neighbor_id"), col("cosine_micro"))
    val expected = scored.groupBy("query_id")
      .agg(BoundedTopKAgg.topK(cand, k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.neighbor_id"), col("col.cosine_micro"),
        (col("pos") + 1).cast("long").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))

    val actual = graft.ann.Ann.bruteForceTopK(vecs, q, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))

    assert(actual.length == expected.length && actual.nonEmpty)
    actual.zip(expected).foreach { case (a, e) => assert(a == e, s"$a != $e") }
    vecs.unpersist()
  }

  test("sample_knn partial merge across partitions == single partition") {
    import spark.implicits._
    val pts = (0L until 300L).map(i => (i, Array(i.toDouble % 17, (i * 3).toDouble % 13)))
    val qids = Array(5L, 100L)
    val qvecs = Array(pts(5)._2, pts(100)._2)
    def runWith(parts: Int) = pts.toDF("eid", "mid")
      .select(col("eid"), col("mid").cast("array<double>").as("mid"))
      .repartition(parts)
      .agg(SampleKnn.knn(col("mid"), col("eid"), qids, qvecs, 5).as("all"))
      .select(explode(col("all")).as("e"))
      .select(col("e.i_eid"), col("e.nn"))
      .collect().map(r => (r.getLong(0), r.getSeq[Any](1))).sortBy(_._1).toSeq
    assert(runWith(1) == runWith(7))
  }
}
