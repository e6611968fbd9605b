package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Property-based check of BOTH connected-components algorithms against an
  * independent in-test oracle (driver-side union-find) on arbitrary random
  * graphs — stronger than mutual agreement: a shared systematic bug in the
  * two distributed implementations cannot hide from the sequential one. */
class CcPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Sequential union-find with path compression; labels = component min. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private val graphGen: Gen[List[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 40)
    nEdges <- Gen.choose(1, 60)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong - 1)
      b <- Gen.choose(0L, nNodes.toLong - 1)
    } yield (a, b))
  } yield edges.filter { case (a, b) => a != b }

  test("min-label AND star-contraction CC == sequential union-find on random graphs") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(graphGen) { edges =>
      edges.isEmpty || {
        val expected = unionFind(edges)
        val df = edges.toDF("a", "b")
        val byLabel = Dedup.connectedComponents(df, "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val byStar = Dedup.connectedComponentsStar(df, "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        byLabel == expected && byStar == expected
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }
}
