package graft.core

import org.apache.spark.sql.DataFrame

/** Shared primitives for the gated driver-local graph kernels
  * (ConnectedComponents / LabelPropagation / TriangleCount /
  * PageRank.fixedIterPortableLocal): one collected edge list, a sorted
  * distinct id table with dense indices, and an undirected CSR.
  * Primitive arrays throughout — no boxed tuples or hash maps (the
  * ApproxCloseness-advice posture shared with SpectralInit /
  * PathCentralitySmall).
  *
  * All outputs are deterministic functions of the input ROW MULTISET
  * (ids are sorted, indices are ranks, CSR slots are filled in input
  * row order), so kernels built on them inherit the parity arguments
  * of their callers.
  */
object LocalGraph {

  /** Collect a two-long-column frame into two primitive arrays. */
  def collectPairs(df: DataFrame, c1: String, c2: String): (Array[Long], Array[Long]) = {
    val rows = df.select(c1, c2).collect()
    val a = new Array[Long](rows.length)
    val b = new Array[Long](rows.length)
    var i = 0
    while (i < rows.length) {
      val r = rows(i); a(i) = r.getLong(0); b(i) = r.getLong(1); i += 1
    }
    (a, b)
  }

  /** Sorted distinct endpoint ids plus the dense index of every row's
    * endpoints: ids(sIdx(i)) == srcA(i), ids(dIdx(i)) == dstA(i).
    */
  def dense(srcA: Array[Long], dstA: Array[Long]): (Array[Long], Array[Int], Array[Int]) = {
    val ids: Array[Long] = {
      val all = new Array[Long](srcA.length * 2)
      System.arraycopy(srcA, 0, all, 0, srcA.length)
      System.arraycopy(dstA, 0, all, srcA.length, dstA.length)
      java.util.Arrays.sort(all)
      var w = 0
      var j = 0
      while (j < all.length) {
        if (w == 0 || all(j) != all(w - 1)) { all(w) = all(j); w += 1 }
        j += 1
      }
      java.util.Arrays.copyOf(all, w)
    }
    val sIdx = new Array[Int](srcA.length)
    val dIdx = new Array[Int](srcA.length)
    var i = 0
    while (i < srcA.length) {
      sIdx(i) = java.util.Arrays.binarySearch(ids, srcA(i))
      dIdx(i) = java.util.Arrays.binarySearch(ids, dstA(i))
      i += 1
    }
    (ids, sIdx, dIdx)
  }

  /** Undirected CSR over dense indices: both directions of every input
    * row, slots filled in input row order. Degree of v is
    * rowPtr(v+1) - rowPtr(v).
    */
  def undirectedCsr(n: Int, sIdx: Array[Int], dIdx: Array[Int]): (Array[Int], Array[Int]) = {
    val deg = new Array[Int](n)
    var i = 0
    while (i < sIdx.length) { deg(sIdx(i)) += 1; deg(dIdx(i)) += 1; i += 1 }
    val rowPtr = new Array[Int](n + 1)
    i = 0
    while (i < n) { rowPtr(i + 1) = rowPtr(i) + deg(i); i += 1 }
    val colIdx = new Array[Int](rowPtr(n))
    val cursor = rowPtr.clone()
    var j = 0
    while (j < sIdx.length) {
      colIdx(cursor(sIdx(j))) = dIdx(j); cursor(sIdx(j)) += 1
      colIdx(cursor(dIdx(j))) = sIdx(j); cursor(dIdx(j)) += 1
      j += 1
    }
    (rowPtr, colIdx)
  }
}
