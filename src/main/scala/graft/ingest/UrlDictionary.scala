package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** URL -> dense Long id densification (north_star: "densifies URLs to
  * long vertex IDs via a broadcast/sorted dictionary join").
  *
  * The reference re-densifies external ids with a host-side dict
  * (/root/reference/graphem/datasets.py:161-164, 649-652;
  * run_benchmarks.py:247-268). At 10^12-URL scale a driver dict is
  * impossible, so the scale path is a SORTED DICTIONARY built without
  * any global single-partition sort:
  *
  *   1. range-partition the distinct URLs by url (P ranges);
  *   2. dense-rank *within* each range partition (local window);
  *   3. add per-partition offsets (a P-row table, broadcast).
  *
  * Ids are dense 0..n-1 in global url sort order — deterministic across
  * parallelism levels. The dictionary join back onto edge endpoints is a
  * broadcast join when the dictionary is small, else a shuffle join that
  * AQE plans (both endpoints join the same dictionary, so the exchange
  * on the dictionary side is reused).
  */
object UrlDictionary {

  /** Build (url, id) with dense ids in url sort order. */
  def build(spark: SparkSession, urls: DataFrame, partitions: Int = 0): DataFrame = {
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val distinctUrls = urls.select(col("url")).distinct()
    val ranged = distinctUrls.repartitionByRange(p, col("url"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // rank within each range partition — no global sort anywhere
    val local = ranged
      .withColumn("pid", spark_partition_id())
      .withColumn("rn",
        row_number().over(Window.partitionBy("pid").orderBy("url")))
    val counts = ranged.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("pid").collect()
    var off = 0L
    val offsets = counts.map { r =>
      val o = (r.getInt(0), off); off += r.getLong(1); o
    }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    // MUST materialize before unpersisting `ranged`: the ids are only
    // correct against the exact range bounds the offsets were collected
    // from, and a lazy recompute of repartitionByRange re-samples bounds.
    val dict = local.join(broadcast(offsetsDf), "pid")
      .select(col("url"), (col("offset") + col("rn") - 1L).as("id"))
      .localCheckpoint(true)
    ranged.unpersist(false)
    dict
  }

  /** Map a (src_url, dst_url) table to (src, dst) long ids via two
    * dictionary joins.
    */
  def densify(links: DataFrame, dict: DataFrame): DataFrame =
    links
      .join(dict.select(col("url").as("src_url"), col("id").as("src")), "src_url")
      .join(dict.select(col("url").as("dst_url"), col("id").as("dst")), "dst_url")
      .select(col("src"), col("dst"))
}
