package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{GlobalRank, SuffixArray}

/** GlobalRank vs the naive single-partition window (bit equivalence + the
  * plan contract that no full-stream window runs unpartitioned), and the
  * suffix-array family vs sequential brute force. */
class SuffixArraySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- GlobalRank ----

  /** Heavy-key skew: value 7 carries half the rows (the shape that melts
    * a co-locating range partition but not the distinct-key ranking). */
  private def skewed = (1 to 2000).map { i =>
    val k = if (i % 2 == 0) 7L else (i % 97).toLong
    (i.toLong, k, s"s${i % 13}")
  }.toDF("id", "k", "s")

  test("denseRank matches the naive global window across part counts") {
    val expected = skewed.withColumn("r",
      dense_rank().over(Window.orderBy(col("k"), col("s"))).cast("long"))
    val got = GlobalRank.denseRank(skewed, Seq("k", "s"), "r")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("rowNumber matches the naive global window on unique keys") {
    val expected = skewed.withColumn("rn",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
    val got = GlobalRank.rowNumber(skewed, Seq("k", "id"), "rn")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("sparseRank matches the naive rank() window under heavy-key skew") {
    val expected = skewed.withColumn("r",
      rank().over(Window.orderBy(col("k"), col("s"))).cast("long"))
    val got = GlobalRank.sparseRank(skewed, Seq("k", "s"), "r")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
    // single-key frame: every row ties — one group spanning partitions
    val one = skewed.select(lit(1L).as("k"), col("id"))
    val uni = GlobalRank.sparseRank(one, Seq("k"), "r")
      .select(col("r")).distinct().as[Long].collect().toSeq
    assert(uni === Seq(1L))
  }

  test("the plan never contains an unpartitioned window") {
    // the whole point of the operator: rank without `Window.orderBy(...)`
    // (Spark plans that as a single-partition sort of the entire input)
    val df = GlobalRank.denseRank(skewed, Seq("k", "s"), "r")
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty,
      s"rank plan should carry no window at all, found ${windows.size}")
  }

  test("null key values rank like any other value (nulls first)") {
    val df = Seq((1L, Option("b")), (2L, None), (3L, Option("a")),
      (4L, None)).toDF("id", "k")
    val got = GlobalRank.denseRank(df, Seq("k"), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  // ---- SuffixArray ----

  private def docsDF(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  /** Sequential reference: depth-`d` SPARSE suffix ranks (1 + count of
    * positions with a strictly smaller prefix) over the same virtual
    * corpus string (separators included, like the operator builds). */
  private def bruteRanks(docs: Seq[(Long, String)], d: Int): Map[Long, Int] = {
    val corpus = docs.sortBy(_._1).flatMap { case (id, text) =>
      text.split(" ").toSeq :+ (SuffixArray.Sep + id)
    }
    val prefixes = corpus.indices.map { i =>
      i.toLong -> corpus.slice(i, math.min(i + d, corpus.length))
    }
    val ordering = math.Ordering.Implicits.seqOrdering[Seq, String]
    prefixes.map { case (g, p) =>
      g -> (1 + prefixes.count { case (_, q) => ordering.lt(q, p) })
    }.toMap
  }

  /** Sequential reference for the longest duplicated n-gram, capped. */
  private def bruteLongestDup(docs: Seq[(Long, String)], cap: Int)
      : (Long, Long, Option[String]) = {
    val tokLists = docs.map(_._2.split(" ").toSeq)
    def dups(l: Int): Seq[String] = tokLists
      .flatMap(t => t.sliding(l).filter(_.length == l).map(_.mkString(" ")))
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val lstar = (1 to cap).reverse.find(l => dups(l).nonEmpty).getOrElse(0)
    if (lstar == 0) (0L, 0L, None)
    else {
      val d = dups(lstar)
      (lstar.toLong, d.size.toLong, Some(d.min))
    }
  }

  private val sample = Seq(
    1L -> "a b r a c a d a b r a",
    2L -> "x y a b r a c z",
    5L -> "q a b r a c a d q q")

  test("positions: contiguous gids, one separator per doc") {
    val pos = SuffixArray.positions(docsDF(sample), "doc_id", "toks")
      .orderBy("gid").collect()
    assert(pos.length === sample.map(_._2.split(" ").length + 1).sum)
    assert(pos.map(_.getLong(0)).toSeq === pos.indices.map(_.toLong))
    val seps = pos.filter(_.getString(3).startsWith(SuffixArray.Sep))
    assert(seps.length === sample.length)
    assert(seps.map(r => r.getString(3)).toSet ===
      sample.map { case (id, _) => SuffixArray.Sep + id }.toSet)
  }

  test("suffixRanks at depth 8 match the sequential reference") {
    val expected = bruteRanks(sample, 8)
    val got = SuffixArray
      .suffixRanks(docsDF(sample), "doc_id", "toks", rounds = 3)
      .select("gid", "r").as[(Long, Long)].collect().toMap
    // operator output excludes separator rows; compare on those gids
    got.foreach { case (g, r) => assert(r === expected(g).toLong, s"gid=$g") }
    assert(got.size === sample.map(_._2.split(" ").length).sum)
  }

  test("longestDupNgram: exact below the cap") {
    // longest duplicated run: "a b r a c a d" (len 7) in docs 1 and 5
    val (l, n, top) = bruteLongestDup(sample, 16)
    assert(l === 7L)
    val got = SuffixArray
      .longestDupNgram(docsDF(sample), "doc_id", "toks", rounds = 4)
      .as[(Long, Long, Option[String])].collect().toSeq
    assert(got === Seq((l, n, top)))
  }

  test("longestDupNgram: reports AT the cap when the true run exceeds it") {
    val (l, n, top) = bruteLongestDup(sample, 4)
    assert(l === 4L)
    val got = SuffixArray
      .longestDupNgram(docsDF(sample), "doc_id", "toks", rounds = 2)
      .as[(Long, Long, Option[String])].collect().toSeq
    assert(got === Seq((l, n, top)))
  }

  /** Sequential reference for the per-document longest duplicated run. */
  private def brutePerDoc(docs: Seq[(Long, String)], cap: Int): Map[Long, Long] = {
    val tokLists = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val best = scala.collection.mutable.Map(docs.map(_._1 -> 0L): _*)
    for (l <- 1 to cap) {
      val g = tokLists.flatMap { case (id, t) =>
        t.sliding(l).filter(_.length == l).map(w => (id, w.mkString(" ")))
      }
      val counts = g.groupBy(_._2).view.mapValues(_.size).toMap
      g.foreach { case (id, gr) =>
        if (counts(gr) >= 2 && best(id) < l) best(id) = l.toLong
      }
    }
    best.toMap
  }

  test("perDocDupRun matches the sequential reference (cap above and below)") {
    for (rounds <- Seq(2, 4)) {
      val cap = 1 << rounds
      val expected = brutePerDoc(sample, cap)
      val got = SuffixArray
        .perDocDupRun(docsDF(sample), "doc_id", "toks", rounds)
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"cap=$cap")
    }
  }

  test("perDocDupRun: documents with nothing repeated report 0") {
    val docs = Seq(1L -> "u v w", 2L -> "x y z", 3L -> "p q u")
    val got = SuffixArray.perDocDupRun(docsDF(docs), "doc_id", "toks", 3)
      .as[(Long, Long)].collect().toMap
    // "u" occurs in docs 1 and 3 — both report a 1-run; doc 2 nothing
    assert(got === Map(1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("longestDupNgram property: random corpora vs brute force") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 6) {
      val vocab = Seq("a", "b", "c")
      val docs = (1L to 6L).map { id =>
        val len = 3 + rnd.nextInt(12)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val expected = bruteLongestDup(docs, 8)
      val got = SuffixArray
        .longestDupNgram(docsDF(docs), "doc_id", "toks", rounds = 3)
        .as[(Long, Long, Option[String])].collect().toSeq
      assert(got === Seq(expected), s"trial=$trial docs=$docs")
      if (trial <= 3) {
        val expectedDoc = brutePerDoc(docs, 8)
        val gotDoc = SuffixArray
          .perDocDupRun(docsDF(docs), "doc_id", "toks", rounds = 3)
          .as[(Long, Long)].collect().toMap
        assert(gotDoc === expectedDoc, s"perDoc trial=$trial docs=$docs")
      }
    }
  }
}
