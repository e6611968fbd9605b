package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Examples, Mixture, TextAnalysis}

/** Property-based contracts for the curation operators, checked against
  * independent in-test oracles on random inputs:
  *
  *   - mixture sampling: kept counts are EXACTLY w_s · min⌊n_s/w_s⌋ for
  *     arbitrary corpora/recipes, and the kept set is the hash-rank
  *     prefix (growth-stability follows);
  *   - FIM splits: (prefix, middle, suffix) reassemble every random
  *     document exactly, with the middle exactly ⌊dl·num/den⌋ tokens.
  */
class CurationPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpusGen: Gen[(List[(Long, String)], List[(String, Int)])] = for {
    nSrc <- Gen.choose(1, 4)
    sizes <- Gen.listOfN(nSrc, Gen.choose(1, 25))
    weights <- Gen.listOfN(nSrc, Gen.choose(1, 4))
    weighted <- Gen.choose(1, nSrc)
  } yield {
    var id = -1L
    val docs = sizes.zipWithIndex.flatMap { case (n, s) =>
      (0 until n).map { _ => id += 1; (id, s"s$s") }
    }
    (docs, (0 until weighted).map(s => s"s$s" -> weights(s)).toList)
  }

  test("mixture sampling: exact counts for arbitrary corpora and recipes") {
    val prop = Prop.forAllNoShrink(corpusGen) { case (docs, recipe) =>
      val df = docs.toDF("doc_id", "src")
      val bySrc = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val u = recipe.map { case (s, w) => bySrc(s) / w }.min
      val expected = recipe.map { case (s, w) => s -> w * u }.toMap
      val kept = Mixture.sampleToMixture(df, "doc_id", "src", recipe)
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // exact per-source counts; sources with expected 0 simply absent
      expected.filter(_._2 > 0) == kept
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 30)
    lens <- Gen.listOfN(n, Gen.choose(0, 40))
  } yield lens.zipWithIndex.map { case (l, i) =>
    (i.toLong, (0 until l).map(j => s"t${i}_$j").mkString(" "))
  }

  test("fim splits: reassembly and exact middle length on random documents") {
    val prop = Prop.forAllNoShrink(docsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
        .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"))
      val out = Examples.fimSplit(df, "doc_id", "toks")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getString(2), r.getString(3)))).toMap
      docs.forall { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty).toSeq
        val (p, m, x) = out(id)
        val back = (p + " " + m + " " + x).split(" ").filter(_.nonEmpty).toSeq
        val wantMid =
          if (toks.length >= 3) toks.length / 3 else 0
        back == toks &&
          m.split(" ").count(_.nonEmpty) == wantMid
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  private val unimaxGen: Gen[(List[(String, Long)], Long)] = for {
    nGrp <- Gen.choose(1, 8)
    sizes <- Gen.listOfN(nGrp, Gen.choose(0L, 50L))
    budget <- Gen.choose(0L, 300L)
  } yield (sizes.zipWithIndex.map { case (n, i) => (s"g$i", n) }, budget)

  test("unimax quotas: exhaustive invariants on random counts and budgets") {
    val prop = Prop.forAllNoShrink(unimaxGen) { case (counts, budget) =>
      val q = Mixture.unimaxQuotasSeq(counts, budget)
      val byG = counts.toMap
      val total = counts.map(_._2).sum
      val sumOk = q.values.sum == math.min(budget, total)
      val capOk = q.forall { case (g, k) => k >= 0 && k <= byG(g) }
      // water level: any UNSATURATED pair's quotas differ by at most 1
      val unsat = q.filter { case (g, k) => k < byG(g) }.values
      val evenOk = unsat.isEmpty || (unsat.max - unsat.min) <= 1
      // no capped group may sit ABOVE the water level: saturated counts
      // are ≤ the unsaturated share, and a remainder +1 recipient that
      // exactly reaches its cap sits at share+1 — never higher
      val levelOk = unsat.isEmpty ||
        q.forall { case (g, k) => k < byG(g) || k <= unsat.max + 1 }
      sumOk && capOk && evenOk && levelOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("unimax in-plan window arithmetic ≡ sequential water-fill") {
    val prop = Prop.forAllNoShrink(unimaxGen) { case (counts, budget) =>
      val df = counts.toDF("g", "n")
      val plan = Mixture.unimaxQuotas(df, "g", "n", budget)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      plan == Mixture.unimaxQuotasSeq(counts, budget)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }

  test("unimax sample: saturated tails fully kept, dominant group capped, hash-prefix stable") {
    val docs = (0 until 120).map(i => (i.toLong, if (i < 90) "en" else "fr"))
      .toDF("doc_id", "lang")
    val kept = Mixture.unimaxSample(docs, "doc_id", "lang", budget = 60)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang === Map("en" -> 30, "fr" -> 30)) // fr saturated, en capped
    // growth stability: doubling the en side must not evict kept fr docs
    val grown = docs.unionByName(
      (200 until 290).map(i => (i.toLong, "en")).toList.toDF("doc_id", "lang"))
    val kept2 = Mixture.unimaxSample(grown, "doc_id", "lang", budget = 60)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept.filter(_._2 == "fr").forall(kept2.contains))
  }
}
