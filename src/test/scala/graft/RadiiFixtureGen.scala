package graft

/** Regenerates the committed radii fixture in Round3Spec — run with
  * `sbt "Test/runMain graft.RadiiFixtureGen"` ONLY when the embedding
  * semantics intentionally change, and paste the printed constants.
  */
object RadiiFixtureGen {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val e = graft.generators.Generators.ba(spark, 100, 2, 5)
    val init = graft.embed.SpectralInit.run(spark, e, d = 2, gramTol = 1e-6)
    val pos = graft.embed.ForceLayout.run(spark, e, init, 3)
    graft.embed.ForceLayout.radii(pos).orderBy("id").limit(10).collect()
      .foreach(r => println(f"""    ${r.getLong(0)}L -> ${r.getDouble(1)}%.12f,"""))
    spark.stop()
  }
}
