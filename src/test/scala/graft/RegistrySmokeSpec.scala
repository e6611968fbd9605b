package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must at least plan and execute at sf0.001 —
  * the in-tests safety net for the whole registry (the oracle gate at
  * sf0.01 is driver-side; this catches runtime regressions in `sbt test`). */
class RegistrySmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  Queries.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val n = q.fn(spark, TestSpark.Sf0001).count()
      assert(n >= 0)
    }
  }
}
