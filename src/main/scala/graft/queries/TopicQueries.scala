package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.{Hashing, Similarity, TextAnalysis}

/** Text-side topic clustering: documents → hashed term-frequency vectors
  * → the exact-integer k-means ([[Similarity.kmeans]]) — the
  * cluster-then-balance step a curation pipeline runs when it has no
  * embedding model (hashing-trick features, Weinberger et al. ICML'09).
  * Complements q85/q95, which cluster EMBEDDINGS; here the features
  * derive from the text itself, so the whole method (featurize + train +
  * assign) is oracle-checkable end to end.
  */
object TopicQueries {

  /** Hashed-TF dimensionality (buckets of [[Hashing.hash31]] mod Dim). */
  val Dim = 16
  val SeedEvery = 125
  val Iters = 2

  /** Per-doc hashed-TF vector: dim d = how many tokens hash to bucket d.
    * One pass builds the hash array ([[Hashing.hash31Array]], native),
    * then Dim bounded filters count each bucket — narrow, no shuffle.
    * Returns (doc_id, qv long[Dim]). */
  private def featurize(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Hashing.hash31Array(TextAnalysis.toks(col("text"))).as("th"))
      .select(col("doc_id").as("vec_id"),
        transform(sequence(lit(0), lit(Dim - 1)),
          d => size(filter(col("th"), h => h % Dim === d)).cast("long")).as("qv"))

  private val featSql: String = {
    val th = s"list_transform(${TextAnalysis.toksSql}, t -> ${Hashing.hash31Sql("t")})"
    s"SELECT doc_id AS vec_id, list_transform(range(0, $Dim), " +
      s"d -> CAST(len(list_filter($th, h -> h % $Dim = d)) AS BIGINT)) AS qv " +
      "FROM documents"
  }

  // ---- Q107: topic clusters over hashed-TF text features ----

  /** Two Lloyd iterations from every 125th document's vector, then the
    * final assignment — (vec_id, cid, dist), the q85 contract on text
    * features. The oracle re-runs featurization AND training. */
  val q107 = Q("q107_topic_clusters", {
    def assign(name: String, cent: String, proj: String) =
      s"""$name AS (SELECT $proj FROM (
        |  SELECT v.vec_id AS vec_id, v.qv AS qv, c.cid AS cid,
        |    ${Similarity.sqDistIntSql("v.qv", "c.cv", Dim)} AS dist
        |  FROM vecs v CROSS JOIN $cent c) x
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)"""
        .stripMargin
    def update(name: String, from: String) =
      s"""$name AS (
        |  SELECT cid, list(cx ORDER BY pos) AS cv FROM (
        |    SELECT cid, i AS pos, CAST(sum(qv[i]) AS BIGINT) // count(*) AS cx
        |    FROM $from, range(1, ${Dim + 1}) t(i) GROUP BY cid, i) GROUP BY cid)"""
        .stripMargin
    s"""WITH vecs AS ($featSql),
      |c0 AS (SELECT vec_id // $SeedEvery AS cid, qv AS cv FROM vecs
      |       WHERE vec_id % $SeedEvery = 0),
      |${assign("a1", "c0", "vec_id, qv, cid")},
      |${update("c1", "a1")},
      |${assign("a2", "c1", "vec_id, qv, cid")},
      |${update("c2", "a2")},
      |${assign("fin", "c2", "vec_id, cid, dist")}
      |SELECT vec_id AS doc_id, cid, dist FROM fin ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    // materialize the featurized vectors: the hashed-TF projection is
    // Dim bounded HOF filters over a per-token md5 array, and the
    // k-means assignment crossJoin would RE-EVALUATE it per centroid
    // row (the documented Catalyst HOF re-evaluation trap) — one
    // localCheckpoint makes featurization a single pass
    val vecs = graft.ops.Materialize.Local(featurize(s, dir))
    val seeds = vecs.filter(col("vec_id") % SeedEvery === 0)
      .select(expr(s"vec_id div $SeedEvery").as("cid"), col("qv").as("cv"))
    val (assign, _) = Similarity.kmeans(vecs, seeds, Iters)
    assign.select(col("vec_id").as("doc_id"), col("cid"), col("dist"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(q107)
}
