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
      // the whole native vector family is SQL-callable too
      val r = s2.sql(
        """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  graft_sqdist(array(1L, 5L), array(4L, 1L)) AS sq,
          |  graft_simhash16(array(1L, 3L)) AS sh,
          |  size(graft_hash31_array(array('a', 'b'))) AS nh,
          |  size(graft_chargram_hash31('abcdef', 3)) AS ng,
          |  size(graft_winnow_min(array(5L, 3L, 7L, 2L), 2)) AS nw""".stripMargin)
        .collect()(0)
      assert(r.getDouble(0) === 11.0)
      assert(r.getLong(1) === 25L) // 3² + 4²
      assert(r.getLong(2) === (1L | 2L)) // bits where votes tie/win: 1&3 share bit0; bit1 ties→set
      assert(r.getInt(3) === 2 && r.getInt(4) === 4 && r.getInt(5) > 0)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
