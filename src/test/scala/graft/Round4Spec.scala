package graft

import org.apache.spark.sql.functions._

/** Round-4 receipts: bounded-memory csrzip superstep at a
  * deliberately large V/P grid, plus the other scale-edge guards.
  */
class Round4Spec extends SparkSuite {

  test("zip-join CSR PageRank: V=2M at P=64 parity, O(V/P) live task memory") {
    import spark.implicits._
    val v = 2000000L
    // deterministic chord graph: ring i--(i+1) plus chord i--(31i+7),
    // all mod V — connected, degree-varying, built scan-side
    val ids = spark.range(v).toDF("id")
    val pairs = ids.select(col("id").as("src"), ((col("id") + 1) % v).as("dst"))
      .union(ids.select(col("id").as("src"),
        ((col("id") * 31 + 7) % v).as("dst")))
    val e = graft.graph.Edges.canonicalize(pairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val index = graft.algos.PageRankCsrZip.buildIndex(spark, e, partitions = 64)
      try {
        assert(index.n == v)
        // live-memory receipt: the superstep holds ONE contrib array +
        // ONE target accumulator, both bounded by the largest block —
        // at V=2M / P=64 that is ~V/P doubles, NOT the old SigmaV
        val maxBlock = index.sizes.max
        assert(maxBlock < 2 * (v / 64).toInt,
          s"block skew: maxBlock=$maxBlock")
        val liveBytes = 2L * maxBlock * 8L
        info(f"per-task live superstep memory <= ${liveBytes / 1024}%d KiB " +
          f"(vs ${index.n * 8 / 1024 / 1024}%d MiB if all P partials were dense)")
        val zip = graft.algos.PageRankCsrZip.runIndexed(spark, index, maxIter = 2,
          tol = 0.0, alpha = 0.85)
        assert(zip.iterations == 2)
        val rel = graft.algos.PageRank.fixedIterUndirected(e, 2)
        val d = rel.join(zip.ranks.withColumnRenamed("rank", "rank2"), "id")
          .agg(max(abs(col("rank") - col("rank2"))).as("md"),
            count(lit(1)).as("cnt")).head()
        assert(d.getLong(1) == v, s"joined ${d.getLong(1)} of $v vertices")
        assert(d.getDouble(0) < 1e-12, s"max |delta| = ${d.getDouble(0)}")
      } finally index.release()
    } finally e.unpersist()
  }

  test("sorted_intersect_count: merge scan equals array_intersect semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val a = rnd.shuffle((0L until 400L).toList).take(rnd.nextInt(50))
        .distinct.sorted.toArray
      val b = rnd.shuffle((0L until 400L).toList).take(rnd.nextInt(50))
        .distinct.sorted.toArray
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
    val got = df.select(col("i"),
        graft.functions.SortedIntersectCount(col("a"), col("b")).as("c"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"row ${r.getInt(0)}: ${r.getLong(1)} vs ${r.getLong(2)}"))
    // empty + null behavior
    val edge = Seq((Array.empty[Long], Array(1L, 2L))).toDF("a", "b")
      .select(graft.functions.SortedIntersectCount(col("a"), col("b")))
      .head().getLong(0)
    assert(edge == 0L)
  }

  test("layout progress hook: invoked once per completed superstep") {
    val e = edgesOf(K4)
    val calls = scala.collection.mutable.ArrayBuffer[Int]()
    val init = graft.embed.SpectralInit.run(spark, e, d = 2, maxIter = 5)
    val cfg = graft.embed.ForceLayout.Config(d = 2, progress = Some((i, m) => {
      calls += i
      assert(m("edges") == 6.0)
      assert(m("iterations_total") == 4.0)
      assert(m("elapsed_secs") >= 0.0)
    }))
    graft.embed.ForceLayout.run(spark, e, init, 4, cfg)
    assert(calls.toList == List(0, 1, 2, 3), calls.toList.toString)
  }

  test("spearman p-value matches scipy's published example and the t integral") {
    import spark.implicits._
    // scipy.stats.spearmanr docs example: spearmanr([1,2,3,4,5],
    // [5,6,7,8,7]) == (0.8207826816681233, 0.08858700531354381)
    val df5 = Seq((1.0, 5.0), (2.0, 6.0), (3.0, 7.0), (4.0, 8.0), (5.0, 7.0))
      .toDF("a", "b")
    val rho = graft.embed.Correlation.spearman(df5, "a", "b")
    assert(math.abs(rho - 0.8207826816681233) < 1e-12, s"rho=$rho")
    val p = graft.core.Stats.spearmanPValue(rho, 5)
    assert(math.abs(p - 0.08858700531354381) < 1e-10, s"p=$p")

    // independent check: two-sided p equals 2 * Simpson integral of the
    // Student-t density over [t, 200]
    def tTailNumeric(t: Double, df: Double): Double = {
      val c = math.exp(breeze.numerics.lgamma((df + 1) / 2.0) -
        breeze.numerics.lgamma(df / 2.0)) / math.sqrt(df * math.Pi)
      def pdf(x: Double) = c * math.pow(1.0 + x * x / df, -(df + 1) / 2.0)
      val n = 400000; val hi = 200.0
      val h = (hi - t) / n
      var s = pdf(t) + pdf(hi)
      var i = 1
      while (i < n) {
        s += (if (i % 2 == 1) 4.0 else 2.0) * pdf(t + i * h); i += 1
      }
      2.0 * s * h / 3.0
    }
    for ((t, df) <- Seq((1.0, 3.0), (2.0, 8.0), (2.5, 30.0), (0.3, 5.0))) {
      val closed = graft.core.Stats.studentTwoSidedP(t, df)
      val numeric = tTailNumeric(t, df)
      assert(math.abs(closed - numeric) < 1e-4, s"t=$t df=$df: $closed vs $numeric")
    }
    // degenerate guards
    assert(graft.core.Stats.spearmanPValue(Double.NaN, 10).isNaN)
    assert(graft.core.Stats.spearmanPValue(0.5, 2).isNaN)
    assert(graft.core.Stats.spearmanPValue(1.0, 10) == 0.0)
  }

  test("sampled-source closeness: exact at k=n, correlated when sampled") {
    // k = n makes the wf-improved Eppstein-Wang estimator EXACTLY the
    // closeness the nx-exact oracle computes — including the
    // disconnected TwoPaths case (the wf component-size factor)
    for (g <- Seq(K4, P10, TwoPaths)) {
      val e = edgesOf(g)
      val n = graft.graph.Edges.vertices(e).count().toInt
      val exact = graft.algos.PathCentralities.closeness(spark, e)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val approx = graft.algos.ApproxCloseness.run(spark, e, k = n,
          localNbrRowCap = 0) // distributed-path proof
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(approx.keySet == exact.keySet)
      approx.foreach { case (id, v) =>
        assert(math.abs(v - exact(id)) < 1e-9, s"v$id: $v vs ${exact(id)}")
      }
    }
    // sampled regime: strong rank agreement with exact on a BA graph
    val e = graft.generators.Generators.ba(spark, 150, 3, 19)
    val exact = graft.algos.PathCentralities.closeness(spark, e)
    val approx = graft.algos.ApproxCloseness.run(spark, e, k = 40)
    import org.apache.spark.sql.functions._
    val joined = exact.toDF("id", "exact")
      .join(approx.toDF("id", "approx"), "id")
    val rho = graft.embed.Correlation.spearman(joined, "exact", "approx")
    assert(rho > 0.8, s"spearman(exact, sampled-40) = $rho")
    // disconnected + SAMPLED (k < n): estimates stay finite, non-negative
    val tp = graft.algos.ApproxCloseness.run(spark, edgesOf(TwoPaths), k = 4)
      .collect().map(_.getDouble(1))
    assert(tp.forall(v => v >= 0.0 && v.isFinite))
  }

  test("sampled-source betweenness: exact at k=n, correlated when sampled") {
    import org.apache.spark.sql.functions._
    // k = n makes Brandes-Pich the exact nx betweenness (incl. the
    // disconnected TwoTriangles case)
    for (g <- Seq(K4, P10, TwoTriangles)) {
      val e = edgesOf(g)
      val n = graft.graph.Edges.vertices(e).count().toInt
      val exact = graft.algos.PathCentralities.betweenness(spark, e)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val approx = graft.algos.ApproxBetweenness.run(spark, e, k = n,
          localNbrRowCap = 0) // distributed-path proof
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(approx.keySet == exact.keySet)
      approx.foreach { case (id, v) =>
        assert(math.abs(v - exact(id)) < 1e-9, s"v$id: $v vs ${exact(id)}")
      }
    }
    // sampled regime: strong rank agreement on a BA graph
    val e = graft.generators.Generators.ba(spark, 120, 3, 29)
    val exact = graft.algos.PathCentralities.betweenness(spark, e)
    val approx = graft.algos.ApproxBetweenness.run(spark, e, k = 40)
    val joined = exact.toDF("id", "exact")
      .join(approx.toDF("id", "approx"), "id")
    val rho = graft.embed.Correlation.spearman(joined, "exact", "approx")
    assert(rho > 0.8, s"spearman(exact, sampled-40) = $rho")
  }

  test("LPA superstep plan: hash-aggregated argmax, no Window node") {
    val e = edgesOf(K8)
    val out = graft.algos.LabelPropagation.run(spark, e, 1)
    // the result is a truncated LogicalRDD; assert on the superstep plan
    // by rebuilding one step symbolically
    import org.apache.spark.sql.functions._
    val nbrs = graft.graph.Edges.neighbors(e)
    val labels = graft.graph.Edges.vertices(e)
      .select(col("id"), col("id").as("label"))
    val counts = nbrs.join(labels, nbrs("nbr") === labels("id"))
      .groupBy(nbrs("id").as("vid"), col("label"))
      .agg(count(lit(1)).as("cnt"))
    val step = counts.groupBy(col("vid").as("id"))
      .agg(max(struct(col("cnt"), (-col("label")).as("neglabel"))).as("m"))
      .select(col("id"), (-col("m.neglabel")).as("label"))
    val plan = step.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "LPA argmax must not plan a window")
    assert(plan.contains("HashAggregate"), plan.take(400))
    assert(out.count() == 8)
  }

  test("csrzip PageRank resumes mid-algorithm to identical scores") {
    import org.apache.spark.sql.functions._
    val e = graft.generators.Generators.ba(spark, 300, 3, 13)
    val full = graft.algos.PageRankCsrZip.run(spark, e, maxIter = 8)
      .ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("csrzip-ckpt").toString
    val index = graft.algos.PageRankCsrZip.buildIndex(spark, e)
    try {
      // "killed" run: 4 of 8 supersteps, committing every 2 -> iter 3
      graft.algos.PageRankCsrZip.runIndexed(spark, index, maxIter = 4, tol = 0.0,
        alpha = 0.85, checkpoint = Some(new graft.core.CheckpointManager(spark, dir)),
        checkpointInterval = 2)
      val cm = new graft.core.CheckpointManager(spark, dir)
      assert(cm.latestIteration().contains(3))
      assert(cm.manifestJson(3).contains("\"partitions\""))
      // fresh run resumes at iteration 4 and finishes the remaining 4
      val resumed = graft.algos.PageRankCsrZip.runIndexed(spark, index, maxIter = 8,
        tol = 0.0, alpha = 0.85, checkpoint = Some(cm), checkpointInterval = 2)
      assert(resumed.iterations == 8)
      val got = resumed.ranks.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == full.keySet)
      got.foreach { case (id, v) =>
        assert(math.abs(full(id) - v) < 1e-12, s"v$id: ${full(id)} vs $v")
      }
    } finally index.release()
  }

  test("embedding seed parameter: same seed reproduces, different seed diverges") {
    // reference test_embedder.py:148-177 (seed reproducibility) and
    // :87-105 (stability across repeated runs)
    val e = graft.generators.Generators.ba(spark, 60, 3, 5)
    def posOf(seed: Long) = graft.embed.SpectralInit
      .run(spark, e, d = 2, seed = seed, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val a = posOf(123L); val b = posOf(123L); val c = posOf(7L)
    assert(a.keySet == b.keySet)
    a.foreach { case (id, p) =>
      p.zip(b(id)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"seed-123 rerun drifted at v$id") }
    }
    val maxDelta = a.map { case (id, p) =>
      p.zip(c(id)).map { case (x, y) => math.abs(x - y) }.max }.max
    assert(maxDelta > 1e-6, "different seeds produced identical embeddings")

    // layout: two identical runs from the same init are bit-stable and
    // bounded (z-score normalization keeps coordinates O(1))
    val init = graft.embed.SpectralInit.run(spark, e, d = 2, maxIter = 20)
    def radiiOf() = graft.embed.ForceLayout.radii(
      graft.embed.ForceLayout.run(spark, e, init, 2,
        graft.embed.ForceLayout.Config(d = 2, sampleSize = 64)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val r1 = radiiOf(); val r2 = radiiOf()
    r1.foreach { case (id, v) =>
      assert(v.isFinite && v < 1000.0)
      assert(math.abs(v - r2(id)) < 1e-9, s"layout rerun drifted at v$id")
    }
  }

  test("IVF top-k: high recall on clustered vectors, bounded candidate scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val centers = Array.fill(30)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 600).map { i =>
      val c = centers(i % 30)
      (i.toLong, c.map(v => (v + rnd.nextGaussian() * 0.15).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") < 10)
    val exact = graft.ann.Ann.bruteForceTopK(vecs, q, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.ann.Ann.ivfTopK(vecs, q, 5, nlist = 32, nprobe = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    // clustered data: the query's cluster-mates share its probed lists
    assert(recall >= 0.6, s"IVF recall@5 = $recall")
    // determinism (the quantizer is training-free): identical reruns
    val again = graft.ann.Ann.ivfTopK(vecs, q, 5, nlist = 32, nprobe = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == again)
  }

  test("vec_cosine equals the HOF fold formulation bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      (i, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("i", "a", "b")
    def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def d(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (s, v) => s + v)
      d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
    }
    df.select(graft.functions.VecCosine(col("a"), col("b")).as("native"),
        hofCosine(col("a"), col("b")).as("hof"))
      .collect().foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1),
          s"${r.getDouble(0)} != ${r.getDouble(1)}")
      }
  }

  test("portable SRP hyperplanes are statistically independent (bucket spread)") {
    import spark.implicits._
    // the old modular family collapsed 2^12 buckets to a few hundred
    // with 1900-member hot buckets on 2k gaussian vectors; the md5
    // family must fill the bucket space near-uniformly
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 2000).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
    val buckets = vecs.select(
        graft.functions.SrpBucketPortable(col("v"), col("vec_id") * 0 + 42, 12).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("distinct_buckets"), max(col("c")).as("hottest"))
      .head()
    assert(buckets.getLong(0) > 1200,
      s"only ${buckets.getLong(0)} distinct buckets for 2000 vectors")
    assert(buckets.getLong(1) <= 12,
      s"hottest bucket has ${buckets.getLong(1)} members")
  }

  test("spectral init: dense small-V graph routes to the distributed path") {
    // V under the vertex cap but E over the (test-shrunk) edge cap must
    // NOT take the driver-local collect path. The paths are
    // value-equivalent (Round3Spec parity), so observe the routing via
    // the output plan: runLocal yields a LocalRelation, the distributed
    // loop a lineage-truncated LogicalRDD.
    val e = graft.generators.Generators.ba(spark, 150, 4, 11)
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.getClass.getSimpleName
    val local = graft.embed.SpectralInit.run(spark, e, d = 2, maxIter = 5)
    assert(planOf(local).contains("LocalRelation"), planOf(local))
    val dist = graft.embed.SpectralInit.run(spark, e, d = 2, maxIter = 5,
      localEdgeCap = 100) // E(=584) exceeds the shrunk cap -> distributed
    assert(planOf(dist).contains("LogicalRDD"), planOf(dist))
  }
}
