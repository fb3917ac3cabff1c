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
  def build(spark: SparkSession, urls: DataFrame, partitions: Int = 0): DataFrame =
    graft.core.Ids.dense(spark, urls.select(col("url")).distinct(),
      Seq("url"), "id", partitions)

  /** Map a (src_url, dst_url) table to (src, dst) long ids via two
    * dictionary joins.
    */
  def densify(links: DataFrame, dict: DataFrame): DataFrame =
    links
      .join(dict.select(col("url").as("src_url"), col("id").as("src")), "src_url")
      .join(dict.select(col("url").as("dst_url"), col("id").as("dst")), "dst_url")
      .select(col("src"), col("dst"))
}
