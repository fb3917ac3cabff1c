package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: where do q_minhash_dedup's seconds go at sf0.1? */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val corpus = d.union(d.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    println(s"docs: ${corpus.count()}")
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val sh = corpus.select(col("doc_id").as("id"),
        graft.text.TextOps.shingles(col("text")).as("sh"))
      time("shingles count")(sh.write.format("noop").mode("overwrite").save())
      val fps = sh.where(size(col("sh")) > 0).select(col("id"),
        transform(col("sh"), s => graft.text.TextOps.rollingHash(s)).as("fps"))
      time("fps noop")(fps.write.format("noop").mode("overwrite").save())
      val sig = fps.select(col("id"),
        transform(sequence(lit(0), lit(15)),
          k => aggregate(col("fps"), lit(Long.MaxValue),
            (acc, f) => least(acc, (f * (k.cast("long") * 2L + 3L) + k.cast("long")) % 1000000007L))).as("sig"))
      time("sig noop")(sig.write.format("noop").mode("overwrite").save())
      time("full minhash")(graft.text.Dedup.minHashNearDups(corpus, "doc_id", "text",
        threshold = 0.9, portableHash = true).count())
    }
    spark.stop()
  }
}
