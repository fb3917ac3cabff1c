package graft.generators

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.DetRandom
import graft.graph.Edges

/** Deterministic graph generators — Spark re-expressions of the 15
  * NetworkX-backed models in /root/reference/graphem/generators.py.
  * All return the canonical undirected edge table (src < dst, distinct,
  * no self-loops).
  *
  * Scalable models (ER/SBM/WS/grid/tree/caveman/bipartite/geometric) are
  * pure column pipelines over spark.range with hash-based randomness —
  * identical output at any parallelism. Inherently sequential models
  * (BA, Holme-Kim, random-regular, scale-free, Delaunay) are built
  * driver-side with a seeded RNG and parallelized — they exist for
  * correctness fixtures at test scale (the reference benches them at
  * n <= 500, /root/reference/run_benchmarks.py:124-149).
  */
object Generators {

  private def fromPairs(spark: SparkSession, pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    Edges.canonicalize(pairs.toDF("src", "dst"))
  }

  /** Erdős–Rényi G(n, p) (generators.py:32-49). Candidate-pair filter:
    * O(n^2) pairs scanned — fine to ~10^4; for web-scale ER use
    * erSparse.
    */
  def er(spark: SparkSession, n: Long, p: Double, seed: Long = 0): DataFrame = {
    val ids = spark.range(n)
    val pairs = ids.select(col("id").as("src"))
      .crossJoin(ids.select(col("id").as("dst")))
      .where(col("src") < col("dst"))
    Edges.canonicalize(pairs.where(
      DetRandom.uniform(seed, col("src"), col("dst")) < p))
  }

  /** ER with expected edge count sampled directly (no n^2 scan): draws
    * ~m = p*n*(n-1)/2 hash-indexed pairs, dedups. Approximates G(n,p)
    * for sparse graphs at any scale (final count is slightly below m
    * after self-loop/duplicate removal — no global limit, which would
    * funnel everything through one partition).
    */
  def erSparse(spark: SparkSession, n: Long, p: Double, seed: Long = 0): DataFrame = {
    val m = (p * n * (n - 1) / 2).toLong
    val draws = spark.range((m * 1.02).toLong + 16)
    Edges.canonicalize(draws.select(
      DetRandom.uniformLong(seed, n, col("id"), lit(0)).as("src"),
      DetRandom.uniformLong(seed, n, col("id"), lit(1)).as("dst")))
  }

  /** Stochastic block model (generators.py:66-103). Returns edges;
    * labels are `id / nPerBlock`.
    */
  def sbm(spark: SparkSession, nPerBlock: Int, numBlocks: Int,
          pIn: Double, pOut: Double, seed: Long = 0): DataFrame = {
    val n = nPerBlock.toLong * numBlocks
    val ids = spark.range(n)
    val pairs = ids.select(col("id").as("src"))
      .crossJoin(ids.select(col("id").as("dst")))
      .where(col("src") < col("dst"))
      .withColumn("p", when(
        (col("src") / nPerBlock).cast("long") ===
          (col("dst") / nPerBlock).cast("long"), pIn).otherwise(pOut))
    Edges.canonicalize(pairs.where(
      DetRandom.uniform(seed, col("src"), col("dst")) < col("p"))
      .select("src", "dst"))
  }

  /** Barabási–Albert preferential attachment (generators.py:106-123) —
    * sequential by nature; driver-side repeated-nodes construction.
    */
  def ba(spark: SparkSession, n: Int, m: Int, seed: Long = 0): DataFrame = {
    val rnd = new Random(seed)
    val repeated = mutable.ArrayBuffer[Long]()
    val edges = mutable.ArrayBuffer[(Long, Long)]()
    var targets = (0L until m.toLong).toArray
    var source = m.toLong
    while (source < n) {
      targets.foreach { t =>
        edges += ((source, t))
        repeated += source; repeated += t
      }
      val next = mutable.Set[Long]()
      while (next.size < m) next += repeated(rnd.nextInt(repeated.size))
      targets = next.toArray
      source += 1
    }
    fromPairs(spark, edges.toSeq)
  }

  /** Watts–Strogatz small world (generators.py:126-145): ring lattice
    * k/2 offsets, each lattice edge rewired with prob p to a hash-chosen
    * target (self-loops/duplicates dropped by canonicalization).
    */
  def ws(spark: SparkSession, n: Long, k: Int, p: Double, seed: Long = 0): DataFrame = {
    val ids = spark.range(n)
    val lattice = ids.select(col("id").as("src"),
        explode(sequence(lit(1), lit(k / 2))).as("off"))
      .select(col("src"), ((col("src") + col("off")) % n).as("dst"), col("off"))
    val rewired = lattice.select(col("src"),
      when(DetRandom.uniform(seed, col("src"), col("off"), lit(0)) < p,
        DetRandom.uniformLong(seed, n, col("src"), col("off"), lit(1)))
        .otherwise(col("dst")).as("dst"))
    Edges.canonicalize(rewired)
  }

  /** Holme–Kim powerlaw cluster graph (generators.py:148-167) —
    * driver-side (sequential preferential attachment + triad closure).
    */
  def powerCluster(spark: SparkSession, n: Int, m: Int, p: Double,
                   seed: Long = 0): DataFrame = {
    val rnd = new Random(seed)
    val repeated = mutable.ArrayBuffer[Long]()
    val adj = mutable.Map[Long, mutable.Set[Long]]()
    def addEdge(u: Long, v: Long): Unit = {
      adj.getOrElseUpdate(u, mutable.Set()) += v
      adj.getOrElseUpdate(v, mutable.Set()) += u
      repeated += u; repeated += v
    }
    (0 until m).foreach(i => adj.getOrElseUpdate(i.toLong, mutable.Set()))
    var source = m.toLong
    while (source < n) {
      var added = 0
      var lastTarget = -1L
      while (added < m) {
        val mySet = adj.getOrElseUpdate(source, mutable.Set())
        def valid(c: Long) = c >= 0 && c != source && !mySet.contains(c)
        var candidate = -1L
        if (added > 0 && lastTarget >= 0 && rnd.nextDouble() < p) {
          // triad closure: random VALID neighbor of the last target
          val nbrs = adj(lastTarget).toSeq.filter(valid).sorted
          if (nbrs.nonEmpty) candidate = nbrs(rnd.nextInt(nbrs.size))
        }
        // preferential attachment with bounded retries, then a
        // deterministic fallback — the early graph can reach states
        // where no repeated-list draw is valid (e.g. source=m already
        // holds every endpoint seen so far), which would spin forever
        var tries = 0
        while (candidate < 0 && tries < 64) {
          val c = if (repeated.nonEmpty) repeated(rnd.nextInt(repeated.size))
            else rnd.nextInt(source.toInt).toLong
          if (valid(c)) candidate = c
          tries += 1
        }
        if (candidate < 0)
          candidate = (0L until source).find(valid).getOrElse(-1L)
        if (candidate < 0) {
          added = m // graph too small for m more edges; stop early
        } else {
          addEdge(source, candidate)
          lastTarget = candidate
          added += 1
        }
      }
      source += 1
    }
    fromPairs(spark,
      adj.toSeq.flatMap { case (u, vs) => vs.toSeq.map(v => (u, v)) })
  }

  /** width x height grid road network (generators.py:170-187). */
  def grid(spark: SparkSession, width: Long, height: Long): DataFrame = {
    val ids = spark.range(width * height)
    val right = ids.where((col("id") % width) < width - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val down = ids.where(col("id") < width * (height - 1))
      .select(col("id").as("src"), (col("id") + width).as("dst"))
    Edges.canonicalize(right.union(down))
  }

  /** Random bipartite (generators.py:190-209): top ids 0..nTop-1,
    * bottom ids nTop..nTop+nBottom-1.
    */
  def bipartite(spark: SparkSession, nTop: Long, nBottom: Long, p: Double,
                seed: Long = 0): DataFrame = {
    val top = spark.range(nTop).select(col("id").as("src"))
    val bottom = spark.range(nTop, nTop + nBottom).select(col("id").as("dst"))
    Edges.canonicalize(top.crossJoin(bottom)
      .where(DetRandom.uniform(seed, col("src"), col("dst")) < p))
  }

  /** Complete bipartite (generators.py:212-231). */
  def completeBipartite(spark: SparkSession, nTop: Long, nBottom: Long): DataFrame = {
    val top = spark.range(nTop).select(col("id").as("src"))
    val bottom = spark.range(nTop, nTop + nBottom).select(col("id").as("dst"))
    Edges.canonicalize(top.crossJoin(bottom))
  }

  /** Random geometric graph (generators.py:329-348): hash-uniform points
    * in [0,1]^2, edges within `radius` — grid-bucketed distance join, no
    * n^2 blowup.
    */
  def geometric(spark: SparkSession, n: Long, radius: Double,
                seed: Long = 0): DataFrame = {
    val pts = spark.range(n).select(col("id"),
      DetRandom.uniform(seed, col("id"), lit(0)).as("x"),
      DetRandom.uniform(seed, col("id"), lit(1)).as("y"))
    val cell = pts.select(col("id"), col("x"), col("y"),
      floor(col("x") / radius).cast("long").as("cx"),
      floor(col("y") / radius).cast("long").as("cy"))
    // replicate each point into its 3x3 cell neighborhood on one side
    val offsets = Seq(-1L, 0L, 1L)
    val probes = cell.select(col("id"), col("x"), col("y"),
      explode(array(offsets.flatMap(dx => offsets.map(dy =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy")))): _*))
        .as("cell"))
      .select(col("id"), col("x"), col("y"),
        col("cell.cx").as("cx"), col("cell.cy").as("cy"))
    val joined = probes.as("a").join(cell.as("b"),
      col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
        col("a.id") < col("b.id"))
    val close = joined.where(
      pow(col("a.x") - col("b.x"), 2) + pow(col("a.y") - col("b.y"), 2)
        <= radius * radius)
    Edges.canonicalize(
      close.select(col("a.id").as("src"), col("b.id").as("dst")))
  }

  /** Connected caveman: l cliques of k (generators.py:351-366). */
  def caveman(spark: SparkSession, l: Long, k: Long): DataFrame = {
    val ids = spark.range(l * k)
    val pairs = ids.select(col("id").as("src"))
      .crossJoin(ids.select(col("id").as("dst")))
      .where(col("src") < col("dst") &&
        (col("src") / k).cast("long") === (col("dst") / k).cast("long"))
    Edges.canonicalize(pairs)
  }

  /** Relaxed caveman (generators.py:369-390): caveman with each edge
    * rewired to a hash-uniform endpoint with prob p.
    */
  def relaxedCaveman(spark: SparkSession, l: Long, k: Long, p: Double,
                     seed: Long = 0): DataFrame = {
    val base = caveman(spark, l, k)
    val n = l * k
    Edges.canonicalize(base.select(col("src"),
      when(DetRandom.uniform(seed, col("src"), col("dst")) < p,
        DetRandom.uniformLong(seed, n, col("src"), col("dst"), lit(7)))
        .otherwise(col("dst")).as("dst")))
  }

  /** Balanced r-ary tree of height h (generators.py:269-284):
    * edge (i, (i-1)/r) for every non-root i.
    */
  def balancedTree(spark: SparkSession, r: Long, h: Int): DataFrame = {
    val n = (0 to h).map(i => math.pow(r.toDouble, i).toLong).sum
    val ids = spark.range(1, n)
    Edges.canonicalize(ids.select(col("id").as("src"),
      ((col("id") - 1) / r).cast("long").as("dst")))
  }

  /** Random d-regular graph (generators.py:287-304) — pairing model with
    * retry, driver-side.
    */
  def randomRegular(spark: SparkSession, n: Int, d: Int, seed: Long = 0): DataFrame = {
    require(n * d % 2 == 0, "n*d must be even")
    val rnd = new Random(seed)
    var attempt = 0
    while (attempt < 1000) {
      val stubs = rnd.shuffle(
        (0 until n).flatMap(i => Seq.fill(d)(i.toLong)).toVector)
      val pairs = stubs.grouped(2).map(s => (s(0), s(1))).toSeq
      val ok = pairs.forall { case (a, b) => a != b } &&
        pairs.map { case (a, b) => (a min b, a max b) }.distinct.size == pairs.size
      if (ok) return fromPairs(spark, pairs)
      attempt += 1
    }
    throw new IllegalStateException(s"random regular graph failed after $attempt attempts")
  }

  /** Directed scale-free graph, symmetrized + self-loops removed
    * (generators.py:307-326) — driver-side Bollobás et al. process.
    */
  def scaleFree(spark: SparkSession, n: Int, alpha: Double = 0.41,
                beta: Double = 0.54, deltaIn: Double = 0.2,
                deltaOut: Double = 0.0, seed: Long = 0): DataFrame = {
    val rnd = new Random(seed)
    val inDeg = mutable.Map[Long, Long]().withDefaultValue(0L)
    val outDeg = mutable.Map[Long, Long]().withDefaultValue(0L)
    val nodes = mutable.ArrayBuffer[Long](0L, 1L, 2L)
    val edges = mutable.ArrayBuffer[(Long, Long)]((0L, 1L), (1L, 2L), (2L, 0L))
    edges.foreach { case (u, v) => outDeg(u) += 1; inDeg(v) += 1 }
    def chooseIn(): Long = {
      val total = edges.size + deltaIn * nodes.size
      var r = rnd.nextDouble() * total
      nodes.foreach { v =>
        r -= inDeg(v) + deltaIn
        if (r <= 0) return v
      }
      nodes.last
    }
    def chooseOut(): Long = {
      val total = edges.size + deltaOut * nodes.size
      var r = rnd.nextDouble() * total
      nodes.foreach { v =>
        r -= outDeg(v) + deltaOut
        if (r <= 0) return v
      }
      nodes.last
    }
    while (nodes.size < n) {
      val roll = rnd.nextDouble()
      if (roll < alpha) {
        val v = nodes.size.toLong; nodes += v
        val w = chooseIn()
        edges += ((v, w)); outDeg(v) += 1; inDeg(w) += 1
      } else if (roll < alpha + beta) {
        val v = chooseOut(); val w = chooseIn()
        edges += ((v, w)); outDeg(v) += 1; inDeg(w) += 1
      } else {
        val w = nodes.size.toLong; nodes += w
        val v = chooseOut()
        edges += ((v, w)); outDeg(v) += 1; inDeg(w) += 1
      }
    }
    fromPairs(spark, edges.toSeq)
  }

  /** Delaunay triangulation of hash-uniform points
    * (generators.py:234-266) — driver-side Bowyer–Watson, test scale.
    */
  def delaunay(spark: SparkSession, n: Int, seed: Long = 0): DataFrame = {
    val rnd = new Random(seed)
    val pts = Array.fill(n)((rnd.nextDouble(), rnd.nextDouble()))
    case class Tri(a: Int, b: Int, c: Int)
    // super-triangle vertices at indices n, n+1, n+2
    val all = pts ++ Array((-10.0, -10.0), (10.0, -10.0), (0.0, 20.0))
    var tris = List(Tri(n, n + 1, n + 2))
    def circum(t: Tri): (Double, Double, Double) = {
      val (ax, ay) = all(t.a); val (bx, by) = all(t.b); val (cx, cy) = all(t.c)
      val d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
      val ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) +
        (cx * cx + cy * cy) * (ay - by)) / d
      val uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) +
        (cx * cx + cy * cy) * (bx - ax)) / d
      val r2 = (ux - ax) * (ux - ax) + (uy - ay) * (uy - ay)
      (ux, uy, r2)
    }
    for (i <- 0 until n) {
      val (px, py) = all(i)
      val (bad, good) = tris.partition { t =>
        val (ux, uy, r2) = circum(t)
        (px - ux) * (px - ux) + (py - uy) * (py - uy) < r2
      }
      val edgeCount = mutable.Map[(Int, Int), Int]().withDefaultValue(0)
      bad.foreach { t =>
        Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)).foreach { case (u, v) =>
          edgeCount((u min v, u max v)) += 1
        }
      }
      val boundary = edgeCount.filter(_._2 == 1).keys
      tris = good ++ boundary.map { case (u, v) => Tri(u, v, i) }
    }
    val edges = tris.flatMap(t => Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)))
      .filter { case (u, v) => u < n && v < n }
      .map { case (u, v) => (u.toLong, v.toLong) }
    fromPairs(spark, edges)
  }
}
