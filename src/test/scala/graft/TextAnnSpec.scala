package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.text.{Dedup, TextOps}

class TextAnnSpec extends SparkSuite {

  test("rolling hash matches the independent oracle value") {
    import spark.implicits._
    val fp = Seq("hello world").toDF("text")
      .select(TextOps.rollingHash(col("text"))).head().getLong(0)
    // DuckDB: list_reduce(list_transform(str_split('hello world',''),
    //   c -> ascii(c)::BIGINT), (a,b) -> (a*31+b) % 1000000007) = 204910434
    assert(fp == 204910434L)
  }

  test("tokens / quality / langid basics") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat."),
      (2L, "der Hund und die Katze ist da"),
      (3L, "zzz qqq")).toDF("doc_id", "text")
    val q = TextOps.quality(df).collect().map(r =>
      r.getLong(0) -> r).toMap
    assert(q(1L).getAs[Long]("n_tokens") == 6L)
    assert(q(1L).getAs[Long]("n_chars") == 23L)
    val langs = df.select(col("doc_id"), TextOps.langId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs == Map(1L -> "en", 2L -> "de", 3L -> "unk"))
  }

  test("exact dedup groups duplicates and keeps min id") {
    import spark.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val g = Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("keep_id") == 1L)
    assert(g(0).getAs[Long]("n_copies") == 3L)
    val kept = Dedup.exactDedup(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("minhash LSH finds exact and near duplicates") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val near = base.replace("pi", "phi") // one token changed
    val far = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far))
      .toDF("doc_id", "text")
    val dups = Dedup.minHashNearDups(df, "doc_id", "text", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups.contains((1L, 2L)), s"exact dup missed: $dups")
    assert(!dups.exists(p => p._1 == 4L || p._2 == 4L), s"false positive: $dups")
  }

  test("simhash: identical texts agree, near texts close, far texts far") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten"
    val near = base.replace("gamma", "gamme")
    val far = "completely different words entirely unrelated content here " +
      "nothing shared with other document at all whatsoever believe me"
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far))
      .toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.simHash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(2L))
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)),
      s"near=${ham(sh(1L), sh(3L))} far=${ham(sh(1L), sh(4L))}")
  }

  test("ngram jaccard: identical=1, disjoint=0") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "x y z w v u")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), TextOps.shingles(col("text")).as("s"))
    val pairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        TextOps.jaccard(col("a.s"), col("b.s")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) == 0.0)
  }

  test("brute-force ANN: finds planted nearest neighbor, determinate ranks") {
    import spark.implicits._
    // vectors on a plane; 1 is closest to 0 by construction
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.7f, 0.7f, 0.0f))).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0), 3)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 4L, 2L))
    assert(top.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
  }

  test("LSH ANN: recall above 0.5 on clustered vectors") {
    import spark.implicits._
    // 3 well-separated clusters of 30 vectors each in 8 dims
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array.fill(8)(rnd.nextGaussian()), Array.fill(8)(rnd.nextGaussian()),
      Array.fill(8)(rnd.nextGaussian()))
    val rows = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(v => (v * 5 + rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where(col("vec_id") < 6)
    val bf = Ann.bruteForceTopK(df, q, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ls = Ann.lshTopK(df, q, 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ls).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall=$recall")
  }
}
