package graft.algos

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.graph.CsrBlocks

/** PageRank over co-partitioned CSR blocks with a ZIP-JOINED rank
  * vector — the cluster-scale variant of PageRankCsr with NO broadcast
  * and NO per-superstep driver stage (the O(V) collect/merge/broadcast
  * loop PageRankCsr runs on the driver is gone entirely).
  *
  * Layout: vertex state lives as one dense Array[Double] per hash
  * partition, aligned index-for-index with that partition's CSR block
  * (same partitioner, so the per-superstep gather is a zipPartitions —
  * no shuffle, no join). Each superstep:
  *
  *   1. zip(blocks, x): every partition PUSHES x(u)/deg(u) along its
  *      edges into per-target-partition dense partial-sum arrays —
  *      pure primitive-array arithmetic, edge targets pre-resolved at
  *      build time to (targetPartition, targetLocalIndex) AND grouped
  *      by target partition (counting sort, build time), so the
  *      superstep streams ONE accumulator at a time: allocate the
  *      array for target t, fill it from t's contiguous edge run, hand
  *      it to the shuffle writer, drop it. Per-task LIVE memory is
  *      therefore O(V/P) — one local contrib array plus one target
  *      accumulator (~2·(V/P)·8 bytes ≈ 1.6 MB at V=10^9 / P=10^4) —
  *      NOT O(V): no task ever holds all P partials at once;
  *   2. reduceByKey on the target partition id merges the partials
  *      executor-side (elementwise array add) — the ONLY shuffle, at
  *      most P x V doubles (<= E doubles once avg degree >= P), and
  *      only for (src-part, tgt-part) pairs an edge actually crosses;
  *   3. mapValues applies base + alpha * sum in place.
  *
  * The driver never touches per-vertex data: convergence (tol > 0) is a
  * distributed L1-delta action returning one double. At V = 10^9 /
  * P = 10^4 the per-superstep driver work is O(P) scheduler bookkeeping,
  * vs PageRankCsr's 8 GB collect + single-threaded merge + 8 GB
  * broadcast.
  *
  * The one-time build cost is an E-sized join resolving every adjacency
  * entry to its owner's (partition, localIndex) — amortized over the
  * superstep loop exactly like the relational engine's pre-shuffled
  * links table.
  *
  * Semantics match PageRank.fixedIterUndirected / nx.pagerank on
  * canonical undirected edges (degree >= 1 everywhere, no dangling
  * mass), scores within 1e-12 of the relational engine.
  */
object PageRankCsrZip {

  case class Result(ranks: DataFrame, iterations: Int, err: Double,
                    edgesPerSecPerSuperstep: Double)

  /** Per-partition CSR with pre-resolved push targets, edges GROUPED BY
    * TARGET PARTITION: run r covers edge slots runPtr(r)..runPtr(r+1)
    * (runPtr has length P+1; empty runs are zero-length), and edge slot
    * j pushes from local source srcLocal(j) to local index tgtLocal(j)
    * of target partition r. rowPtr survives only to supply out-degrees.
    */
  case class ZipBlock(vertexIds: Array[Long], rowPtr: Array[Int],
                      runPtr: Array[Int], srcLocal: Array[Int],
                      tgtLocal: Array[Int])

  /** Built, cached superstep index — build once (`buildIndex`), iterate
    * many times (`run(index, ...)`); `release()` when done.
    */
  final class ZipIndex private[PageRankCsrZip] (
      val part: HashPartitioner,
      val zblocks: RDD[(Int, ZipBlock)],
      val sizes: Array[Int],
      val n: Long,
      val m2: Long) {
    def release(): Unit = zblocks.unpersist(blocking = true)
  }

  /** One-time index build: CSR blocks hash-partitioned by vertex, every
    * adjacency entry resolved to its owner's (partition, localIndex)
    * via one E-sized shuffle join. Amortized over every subsequent
    * `run(index, ...)` — on a long-lived cluster the index is built
    * once per graph snapshot and reused across PageRank runs,
    * convergence sweeps, and parameter studies.
    */
  def buildIndex(spark: SparkSession, edges: DataFrame,
                 partitions: Int = 0): ZipIndex = {
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // identity partitioner on keys 0..p-1 (Int.hashCode == value)
    val part = new HashPartitioner(p)

    val csr = CsrBlocks.build(spark, edges, p).rdd
      .map(b => (b.partId, b)).partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val loc = csr.flatMap { case (pid, b) =>
      b.vertexIds.iterator.zipWithIndex.map { case (v, i) => (v, (pid, i)) }
    }
    val resolved = csr.flatMap { case (pid, b) =>
        b.colIdx.iterator.zipWithIndex.map { case (nbr, j) => (nbr, (pid, j)) }
      }
      .join(loc, p)
      .map { case (_, ((srcPid, j), (tPid, tLoc))) => (srcPid, (j, tPid, tLoc)) }
      .partitionBy(part)
    val zblocks = csr.zipPartitions(resolved, preservesPartitioning = true) {
      (bi, ri) =>
        if (!bi.hasNext) Iterator.empty
        else {
          val (pid, b) = bi.next()
          val m = b.colIdx.length
          val tp = new Array[Int](m)
          val tl = new Array[Int](m)
          ri.foreach { case (_, (j, tPid, tLoc)) => tp(j) = tPid; tl(j) = tLoc }
          // local source index of each CSR edge slot
          val sl = new Array[Int](m)
          var i = 0
          while (i < b.vertexIds.length) {
            var j = b.rowPtr(i)
            while (j < b.rowPtr(i + 1)) { sl(j) = i; j += 1 }
            i += 1
          }
          // counting sort by target partition: one-time O(m + P) build
          // cost that buys the superstep its O(V/P) live-memory bound
          val runPtr = new Array[Int](p + 1)
          var j = 0
          while (j < m) { runPtr(tp(j) + 1) += 1; j += 1 }
          var t = 0
          while (t < p) { runPtr(t + 1) += runPtr(t); t += 1 }
          val pos = runPtr.clone()
          val sl2 = new Array[Int](m)
          val tl2 = new Array[Int](m)
          j = 0
          while (j < m) {
            val k = pos(tp(j)); sl2(k) = sl(j); tl2(k) = tl(j)
            pos(tp(j)) += 1; j += 1
          }
          Iterator.single((pid, ZipBlock(b.vertexIds, b.rowPtr, runPtr, sl2, tl2)))
        }
    }.persist(StorageLevel.MEMORY_AND_DISK)

    // per-partition state sizes (P ints — the only thing broadcast, once)
    val sizeRows = zblocks.map { case (pid, b) => (pid, b.vertexIds.length) }
      .collect()
    val sizes = new Array[Int](p)
    sizeRows.foreach { case (pid, s) => sizes(pid) = s }
    val n = sizes.map(_.toLong).sum
    val m2 = zblocks.map(_._2.srcLocal.length.toLong).reduce(_ + _)
    csr.unpersist(false) // zblocks supersede the raw blocks
    new ZipIndex(part, zblocks, sizes, n, m2)
  }

  /** Convenience: build + run + release. */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int,
          tol: Double = 0.0, alpha: Double = 0.85,
          partitions: Int = 0): Result = {
    val index = buildIndex(spark, edges, partitions)
    try runIndexed(spark, index, maxIter, tol, alpha)
    finally index.release()
  }

  /** tol <= 0 runs exactly `maxIter` supersteps (one multi-stage job —
    * no per-superstep action at all); tol > 0 adds one scalar-returning
    * delta action per superstep.
    *
    * `checkpoint` gives this engine the same mid-algorithm durability
    * contract as the relational PageRank (north_rule: per-iteration
    * snapshots + manifest lineage + metrics, resumable): every
    * `checkpointInterval` supersteps (and on the final one) the rank
    * vector is written through CheckpointManager as an (id, rank)
    * snapshot; a fresh run against the same directory resumes from the
    * latest committed iteration by routing the snapshot back onto the
    * co-partitioned block layout with one V-sized join (no E-sized
    * work). Checkpointing also materializes the superstep chain, so
    * fixed-iteration mode trades the single fused job for durability at
    * the chosen cadence.
    */
  def runIndexed(spark: SparkSession, index: ZipIndex, maxIter: Int,
          tol: Double, alpha: Double,
          checkpoint: Option[graft.core.CheckpointManager] = None,
          checkpointInterval: Int = 5): Result = {
    val sc = spark.sparkContext
    val part = index.part
    val zblocks = index.zblocks
    val sizes = index.sizes
    val n = index.n
    val m2 = index.m2
    val bSizes = sc.broadcast(sizes)
    val base = (1.0 - alpha) / n

    def step(x: RDD[(Int, Array[Double])]): RDD[(Int, Array[Double])] = {
      val msgs = zblocks.zipPartitions(x, preservesPartitioning = false) {
        (bi, xi) =>
          if (!bi.hasNext || !xi.hasNext) Iterator.empty
          else {
            val (_, b) = bi.next()
            val xv = xi.next()._2
            val sz = bSizes.value
            // per-source contribution x(u)/deg(u) — O(V/P) doubles
            val contrib = new Array[Double](b.vertexIds.length)
            var i = 0
            while (i < contrib.length) {
              val d = b.rowPtr(i + 1) - b.rowPtr(i)
              if (d > 0) contrib(i) = xv(i) / d
              i += 1
            }
            // stream ONE target accumulator at a time: the shuffle
            // writer serializes each (t, acc) before next() allocates
            // the following one, so live memory stays O(max block),
            // never O(V). Only targets an edge actually reaches emit.
            new Iterator[(Int, Array[Double])] {
              private def skipEmpty(from: Int): Int = {
                var k = from
                while (k < sz.length && b.runPtr(k + 1) == b.runPtr(k)) k += 1
                k
              }
              private var t = skipEmpty(0)
              def hasNext: Boolean = t < sz.length
              def next(): (Int, Array[Double]) = {
                val acc = new Array[Double](sz(t))
                var j = b.runPtr(t); val en = b.runPtr(t + 1)
                while (j < en) {
                  acc(b.tgtLocal(j)) += contrib(b.srcLocal(j)); j += 1
                }
                val res = (t, acc)
                t = skipEmpty(t + 1)
                res
              }
            }
          }
      }
      // mapSideCombine = false is what actually DELIVERS the O(V/P)
      // live-memory bound: keys are distinct within a task (each target
      // partition is emitted once), so reduceByKey's default map-side
      // ExternalAppendOnlyMap would merge nothing yet buffer every
      // streamed accumulator before shuffle write. With it off, each
      // (t, acc) goes straight to the shuffle writer and the merge runs
      // reduce-side only — identical result, bounded mapper memory.
      def add(a: Array[Double], b: Array[Double]): Array[Double] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      msgs
        .combineByKeyWithClassTag[Array[Double]](
          (a: Array[Double]) => a, add, add, part, mapSideCombine = false)
        .mapValues { s =>
          val o = new Array[Double](s.length)
          var i = 0
          while (i < s.length) { o(i) = base + alpha * s(i); i += 1 }
          o
        }
    }

    import spark.implicits._
    // (id, rank) view of a state vector — the checkpoint/result shape
    def ranksOf(xv: RDD[(Int, Array[Double])]): DataFrame =
      zblocks.zipPartitions(xv) { (bi, xi) =>
        if (!bi.hasNext || !xi.hasNext) Iterator.empty
        else {
          val (_, b) = bi.next(); val arr = xi.next()._2
          b.vertexIds.iterator.zipWithIndex.map { case (v, i) => (v, arr(i)) }
        }
      }.toDF("id", "rank")
    // route an (id, rank) snapshot back onto the block layout: one
    // V-sized join against the blocks' own (id -> (partition, index))
    // map — never touches edges
    def stateFromRanks(df: DataFrame): RDD[(Int, Array[Double])] = {
      val pairs = df.select("id", "rank").rdd
        .map(r => (r.getLong(0), r.getDouble(1)))
      val loc = zblocks.flatMap { case (pid, b) =>
        b.vertexIds.iterator.zipWithIndex.map { case (v, i) => (v, (pid, i)) }
      }
      val routed = pairs.join(loc, part.numPartitions)
        .map { case (_, (rank, (pid, i))) => (pid, (i, rank)) }
        .partitionBy(part)
      zblocks.zipPartitions(routed, preservesPartitioning = true) { (bi, ri) =>
        if (!bi.hasNext) Iterator.empty
        else {
          val (pid, b) = bi.next()
          val arr = new Array[Double](b.vertexIds.length)
          ri.foreach { case (_, (i, rank)) => arr(i) = rank }
          Iterator.single((pid, arr))
        }
      }
    }

    val resumed = checkpoint.flatMap(_.resume())
    val startIter = resumed.map(_._1 + 1).getOrElse(0)
    var x: RDD[(Int, Array[Double])] = resumed match {
      case Some((_, snap)) => stateFromRanks(snap)
        .persist(StorageLevel.MEMORY_AND_DISK)
      case None => zblocks.mapValues(b => Array.fill(b.vertexIds.length)(1.0 / n))
    }
    var iter = startIter
    var err = Double.MaxValue
    var prevCommitted: Option[RDD[(Int, Array[Double])]] = None
    val t0 = System.nanoTime()
    while (iter < maxIter && (tol <= 0 || err >= n * tol)) {
      val nx = step(x)
      if (tol > 0) {
        nx.persist(StorageLevel.MEMORY_AND_DISK)
        // distributed L1 delta — ONE scalar reaches the driver
        err = nx.zipPartitions(x) { (ai, bi) =>
          if (!ai.hasNext || !bi.hasNext) Iterator.empty
          else {
            val a = ai.next()._2; val b = bi.next()._2
            var s = 0.0; var i = 0
            while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
            Iterator.single(s)
          }
        }.sum()
        x.unpersist(false)
      }
      x = nx
      checkpoint.foreach { cm =>
        val lastStep = iter + 1 == maxIter || (tol > 0 && err < n * tol)
        if ((iter + 1) % checkpointInterval == 0 || lastStep) {
          // fixed mode has no per-superstep persist: cache the committed
          // state so the snapshot write and the next superstep share it
          if (tol <= 0) {
            nx.persist(StorageLevel.MEMORY_AND_DISK)
            prevCommitted.foreach(_.unpersist(false))
            prevCommitted = Some(nx)
          }
          cm.commit(iter, ranksOf(nx), Map("err" -> err, "n" -> n.toDouble))
        }
      }
      iter += 1
    }
    val ranks = ranksOf(x)
    // eager lineage truncation materializes THROUGH the superstep chain
    // (timing boundary) and pins the result before the blocks and state
    // caches are released below
    val out = graft.core.Lineage.truncate(ranks)
    val secs = (System.nanoTime() - t0) / 1e9
    val steps = iter - startIter
    val eps = if (steps > 0) (m2 / 2.0) * steps / secs else 0.0
    x.unpersist(false)
    prevCommitted.foreach(_.unpersist(false))
    bSizes.unpersist(false) // the caller-owned index outlives this run
    Result(out, iter, err, eps)
  }
}
