package graft

import org.apache.spark.sql.functions._

object EmbDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val pert = emb.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001) + lit(0.01)).as("embedding"))
    val corpus = emb.union(pert)
    println(s"corpus rows: ${corpus.count()}")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val c = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
      .persist()
    val cb = c.select(col("id"), posexplode(
        transform(sequence(lit(0), lit(7)),
          t => graft.ann.Ann.srpBucketPortable(col("v"), 12, lit(42L) + t.cast("long") * 1000L))))
      .select(col("id"), col("pos").as("t"), col("col").as("b")).persist()
    time("bucket hash")(cb.count())
    val counts = cb.groupBy("t","b").agg(count(lit(1)).as("bc"))
    time("top buckets")(counts.orderBy(desc("bc")).limit(10).collect()
      .foreach(r => println(s"  t=${r.getInt(0)} b=${r.getLong(1)} size=${r.getLong(2)}")))
    val cands = cb.as("x").join(cb.as("y"),
        col("x.t")===col("y.t") && col("x.b")===col("y.b") && col("x.id")<col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    val preDistinct = time("candidate join count")(cands.count())
    println(s"pre-distinct candidates: $preDistinct")
    val distinctCands = cands.distinct().persist()
    val nd = time("distinct")(distinctCands.count())
    println(s"distinct candidates: $nd")
    val verified = distinctCands
      .join(c.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(c.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(graft.ann.Ann.cosine(col("va"), col("vb")) * 1e6, 0).cast("long").as("cm"))
      .where(col("cm") >= 900000L)
    val nv = time("verify (HOF cosine)")(verified.count())
    println(s"verified pairs: $nv")
    spark.stop()
  }
}
