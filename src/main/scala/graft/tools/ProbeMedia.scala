package graft.tools

/** Dev probe: prints the q_media_features aggregate so oracle literals can
  * be pinned from a real run (the encoder-dependent total_bytes cannot be
  * derived by arithmetic; see Queries.scala's q_media_features comment).
  */
object ProbeMedia {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Media.featureStats(
      graft.ops.Media.decode(graft.ops.Media.mediaTable(spark, 300)))
      .show(false)
    spark.stop()
  }
}
