package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local SparkSession for specs (one per suite; small core count
  * keeps test latency down).
  */
trait TestSpark extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession =
    Sessions.builder("4").appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh-dir").toString)
      .getOrCreate()

  override def afterAll(): Unit = {
    // session is shared process-wide; don't stop between suites
    super.afterAll()
  }
}
