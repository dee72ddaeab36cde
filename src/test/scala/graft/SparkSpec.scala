package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** One shared local session for the whole forked test JVM. */
trait SparkSpec { self: Suite =>
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = graft.GraftSession.local(4, "graft-test")
}
