package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bucketing
import graft.plans.GraftExtensions

/** The config-driven registration path (`spark.sql.extensions=
  * graft.plans.GraftExtensions`): a session built withExtensions gets the
  * native function and the TopK strategy without programmatic setup. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions session resolves graft_bucket_argmin from SQL") {
    val base = TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions).getOrCreate()
      val resos = Bucketing.makeBucketResolutions()
      val idx = s2.sql("SELECT graft_bucket_argmin(640, 1024) AS i")
        .collect()(0).getInt(0)
      assert(resos(idx - 1) === ((640, 1024))) // exact grid match returns own slot
      val idx2 = s2.sql("SELECT graft_bucket_argmin(333, 999) AS i")
        .collect()(0).getInt(0)
      assert(idx2 >= 1 && idx2 <= resos.size)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
