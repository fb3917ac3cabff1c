package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style checkpoint/lineage layer over Parquet.
  *
  * The sandbox has no Iceberg runtime jar, so the table-format contract
  * the north_rule asks for (per-iteration snapshots, per-partition
  * lineage, resumable mid-algorithm) is realized as Parquet snapshot
  * directories plus a JSON manifest per committed iteration:
  *
  * {{{
  * <root>/iter=K/part-*.parquet          -- vertex-state snapshot
  * <root>/manifest-K.json                -- commit record (atomic rename)
  * }}}
  *
  * Manifest fields: iteration, parent iteration (lineage), per-partition
  * file list with sizes (partition lineage), row count, and free-form
  * convergence metrics. A manifest is written to a temp name and
  * atomically renamed, so a killed run never leaves a half-committed
  * snapshot: resume picks the largest K with a valid manifest.
  *
  * Checkpointing every iteration also truncates the logical plan of
  * iterative join/agg loops (plan size otherwise grows linearly and
  * optimizer time super-linearly — the Spark-side analogue of the
  * reference's `block_until_ready` sync, /root/reference/graphem/embedder.py:167).
  */
final class CheckpointManager(spark: SparkSession, root: String) {

  Files.createDirectories(Paths.get(root))

  private def snapDir(iter: Int): String = s"$root/iter=$iter"
  private def manifestPath(iter: Int): Path = Paths.get(s"$root/manifest-$iter.json")

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Write `df` as snapshot for `iter`, commit a manifest, and return the
    * re-read DataFrame (fresh lineage).
    */
  def commit(iter: Int, df: DataFrame, metrics: Map[String, Double]): DataFrame = {
    val dir = snapDir(iter)
    df.write.mode("overwrite").parquet(dir)
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => (p.getFileName.toString, Files.size(p)))
      .toSeq.sortBy(_._1)
    val reread = spark.read.parquet(dir)
    val rows = reread.count()
    val parent = if (iter > 0) (iter - 1).toString else "null"
    val filesJson = files.map { case (f, sz) =>
      s"""{"file":"${esc(f)}","bytes":$sz}"""
    }.mkString("[", ",", "]")
    val metricsJson = metrics.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${esc(k)}":$v"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"iteration":$iter,"parent":$parent,"rows":$rows,
         |"partitions":$filesJson,
         |"metrics":$metricsJson,
         |"committed_utc":"${java.time.Instant.now()}"}""".stripMargin
    val tmp = Paths.get(s"$root/.manifest-$iter.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(iter), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    reread
  }

  /** Largest committed iteration, if any. */
  def latestIteration(): Option[Int] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return None
    val re = "manifest-(\\d+)\\.json".r
    Files.list(dir).iterator().asScala
      .flatMap(p => p.getFileName.toString match {
        case re(k) => Some(k.toInt); case _ => None
      })
      .reduceOption(_ max _)
  }

  /** Load the snapshot for a committed iteration. */
  def load(iter: Int): DataFrame = spark.read.parquet(snapDir(iter))

  /** Resume point: (iteration, snapshot) for the latest commit. */
  def resume(): Option[(Int, DataFrame)] =
    latestIteration().map(k => (k, load(k)))

  def manifestJson(iter: Int): String =
    new String(Files.readAllBytes(manifestPath(iter)), StandardCharsets.UTF_8)
}
