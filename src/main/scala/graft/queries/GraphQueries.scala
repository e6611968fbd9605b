package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.Graph

/** Link-graph analytics over the click graph implied by `events`: each
  * user's event stream, ordered by time, is a walk over pages (the `k`
  * prop); consecutive visits are directed edges. Error events are
  * terminal — they end the walk, and the error page (node id k+100) keeps
  * no out-edges, so the graph has REAL dangling nodes and the
  * dangling-mass term of [[graft.ops.Graph.pageRank]] is oracle-verified,
  * not just dead code.
  */
object GraphQueries {

  val Damping = 0.85
  val Iters = 5

  /** (src, dst, w) click-transition edges: node = k (+100 when the event
    * is an error), edge weight = transition count, walks per user in
    * (ts, event_id) order, no out-edges from error nodes. */
  private def clickEdges(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        (regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long") +
          when(col("event_type") === "error", lit(100L)).otherwise(lit(0L)))
          .as("node"))
      .withColumn("nxt", lead(col("node"), 1).over(w))
      .filter(col("nxt").isNotNull && col("node") < 100)
      .groupBy(col("node").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
  }

  private val edgesSql =
    """seq AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)
      |      + CASE WHEN event_type = 'error' THEN 100 ELSE 0 END AS node
      |  FROM events),
      |pairs AS (
      |  SELECT node AS src,
      |    lead(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      |  FROM seq),
      |edges AS (
      |  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM pairs
      |  WHERE dst IS NOT NULL AND src < 100 GROUP BY src, dst)""".stripMargin

  // ---- Q125: PageRank over the click graph ----

  /** Five power-iteration rounds at d=0.85; output (node, pr) rounded to
    * 8dp (absorbs partition-order float drift, Q doc convention). The
    * oracle unrolls the identical iteration — same (1-d)/N + d·(contrib +
    * dangling/N) expression shape, so every term including the dangling
    * redistribution is hash-compared. */
  val q125 = Q("q125_pagerank", {
    def stepSql(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""d$i AS (
        |  SELECT coalesce(sum(r.pr), 0) AS dm FROM $prev r
        |  LEFT JOIN outw o ON r.node = o.src WHERE o.src IS NULL),
        |c$i AS (
        |  SELECT p.dst AS node, sum(p.p * r.pr) AS c
        |  FROM prob p JOIN $prev r ON p.src = r.node GROUP BY p.dst),
        |r$i AS (
        |  SELECT n.node,
        |    (1 - CAST($Damping AS DOUBLE)) / (SELECT n FROM nn)
        |      + CAST($Damping AS DOUBLE) * (coalesce(c.c, 0)
        |        + (SELECT dm FROM d$i) / (SELECT n FROM nn)) AS pr
        |  FROM nodes n LEFT JOIN c$i c ON n.node = c.node)""".stripMargin
    }
    s"""WITH $edgesSql,
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges)),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY src),
      |prob AS (SELECT e.src, e.dst, e.w / o.tw AS p
      |         FROM edges e JOIN outw o ON e.src = o.src),
      |r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
      |${(1 to Iters).map(stepSql).mkString(",\n")}
      |SELECT node, round(pr, 8) AS pr FROM r$Iters ORDER BY node""".stripMargin
  }) { (s, dir) =>
    Graph.pageRank(clickEdges(s, dir), Iters, Damping)
      .select(col("node"), round(col("rank"), 8).as("pr"))
      .orderBy(col("node"))
  }

  // ---- Q129: personalized PageRank (TrustRank) ----

  /** [[Graph.personalizedPageRank]] over the same click graph, teleport
    * = each page's ORGANIC-LANDING share: t(v) = view-events(v) / total
    * view events — a data-derived trust prior (pages users actually view
    * seed the walk; error pages get t = 0 and earn rank only through
    * links). The oracle unrolls the personalized recurrence — teleport
    * construction, (1-d)·t init, and dangling·t redistribution all
    * hash-compared. */
  val q129 = Q("q129_trustrank", {
    def stepSql(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""d$i AS (
        |  SELECT coalesce(sum(r.pr), 0) AS dm FROM $prev r
        |  LEFT JOIN outw o ON r.node = o.src WHERE o.src IS NULL),
        |c$i AS (
        |  SELECT p.dst AS node, sum(p.p * r.pr) AS c
        |  FROM prob p JOIN $prev r ON p.src = r.node GROUP BY p.dst),
        |r$i AS (
        |  SELECT n.node,
        |    (1 - CAST($Damping AS DOUBLE)) * n.t
        |      + CAST($Damping AS DOUBLE) * (coalesce(c.c, 0)
        |        + (SELECT dm FROM d$i) * n.t) AS pr
        |  FROM tele n LEFT JOIN c$i c ON n.node = c.node)""".stripMargin
    }
    s"""WITH $edgesSql,
      |vc AS (SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS node,
      |  CAST(count(*) AS DOUBLE) AS cnt
      |  FROM events WHERE event_type = 'view' GROUP BY node),
      |tot AS (SELECT sum(cnt) AS tc FROM vc),
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges
      |  UNION ALL SELECT node FROM vc)),
      |outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY src),
      |prob AS (SELECT e.src, e.dst, e.w / o.tw AS p
      |         FROM edges e JOIN outw o ON e.src = o.src),
      |tele AS (SELECT n.node, coalesce(v.cnt / (SELECT tc FROM tot), 0) AS t
      |         FROM nodes n LEFT JOIN vc v ON n.node = v.node),
      |r0 AS (SELECT node, t AS pr FROM tele),
      |${(1 to Iters).map(stepSql).mkString(",\n")}
      |SELECT node, round(pr, 8) AS pr FROM r$Iters ORDER BY node""".stripMargin
  }) { (s, dir) =>
    val vc = Tables.events(s, dir).filter(col("event_type") === "view")
      .groupBy(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
        .cast("long").as("node"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val tele = vc.crossJoin(broadcast(vc.agg(sum(col("cnt")).as("tc"))))
      .select(col("node"), (col("cnt") / col("tc")).as("t"))
    Graph.personalizedPageRank(clickEdges(s, dir), tele, Iters, Damping)
      .select(col("node"), round(col("rank"), 8).as("pr"))
      .orderBy(col("node"))
  }

  /** [[Graph.triangleCounts]]: exact per-node triangles + local
    * clustering coefficient on the undirected click graph, by
    * degree-ordered orientation (each triangle found once, at its
    * lowest-(degree, id) corner). The oracle replays the identical
    * orientation and wedge-closing joins. */
  val q138 = Q("q138_triangles",
    s"""WITH $edgesSql,
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM edges WHERE src <> dst),
      |deg AS (SELECT u, count(*) AS d FROM (
      |    SELECT a AS u FROM und UNION ALL SELECT b AS u FROM und) s
      |  GROUP BY u),
      |oe AS (SELECT CASE WHEN x.da <= x.db THEN x.a ELSE x.b END AS s,
      |              CASE WHEN x.da <= x.db THEN x.b ELSE x.a END AS t,
      |              CASE WHEN x.da <= x.db THEN x.db ELSE x.da END AS td
      |       FROM (SELECT und.a AS a, und.b AS b, p.d AS da, q.d AS db
      |             FROM und JOIN deg p ON p.u = und.a
      |             JOIN deg q ON q.u = und.b) x),
      |wed AS (SELECT e1.s AS u, e1.t AS v, e2.t AS w
      |        FROM oe e1 JOIN oe e2 ON e2.s = e1.s
      |        WHERE e1.td < e2.td OR (e1.td = e2.td AND e1.t < e2.t)),
      |tri AS (SELECT u, v, w FROM wed
      |        JOIN oe ON oe.s = wed.v AND oe.t = wed.w),
      |nd AS (SELECT unnest([u, v, w]) AS node FROM tri),
      |cnt AS (SELECT node, count(*) AS tri FROM nd GROUP BY node)
      |SELECT c.node AS node, c.tri AS tri, d.d AS degree,
      |  round(2.0 * c.tri / (d.d * (d.d - 1)), 6) AS coeff
      |FROM cnt c JOIN deg d ON d.u = c.node ORDER BY node""".stripMargin) {
    (s, dir) =>
      Graph.triangleCounts(clickEdges(s, dir), "src", "dst")
        .orderBy(col("node"))
  }

  /** [[Graph.kCore]]: four peeling rounds at k=40 over the undirected
    * click graph — enough to cascade (removing a sub-40 node drags
    * borderline neighbors under 40 next round; the sf0.01 degree spread
    * is 8–101 so the cut bites). The oracle unrolls the identical four
    * degree-filter-join rounds, PageRank-style. */
  val q139 = Q("q139_kcore", {
    val (k, rounds) = (40, 4)
    def stepSql(i: Int): String = {
      val prev = s"e${i - 1}"
      s"""d$i AS (SELECT u, count(*) AS d FROM (
        |    SELECT a AS u FROM $prev UNION ALL SELECT b AS u FROM $prev) s
        |  GROUP BY u),
        |k$i AS (SELECT u FROM d$i WHERE d >= $k),
        |e$i AS (SELECT a, b FROM $prev
        |        JOIN k$i ka ON ka.u = $prev.a JOIN k$i kb ON kb.u = $prev.b)"""
        .stripMargin
    }
    s"""WITH $edgesSql,
      |e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |       FROM edges WHERE src <> dst),
      |${(1 to rounds).map(stepSql).mkString(",\n")}
      |SELECT u AS node, count(*) AS degree FROM (
      |  SELECT a AS u FROM e$rounds UNION ALL SELECT b AS u FROM e$rounds) s
      |GROUP BY u ORDER BY node""".stripMargin
  }) { (s, dir) =>
    Graph.kCore(clickEdges(s, dir), "src", "dst", k = 40, rounds = 4)
      .orderBy(col("node"))
  }

  /** [[Graph.labelPropagation]]: three synchronous min-tiebreak rounds
    * over the symmetrized weighted click graph — the community-detection
    * member of the graph family (PageRank = importance, CC = reachability,
    * LPA = cohesion). The oracle unrolls the identical three rounds; its
    * per-node argmax is spelled as a row_number window, while the Spark
    * side uses a max(struct) double-aggregation (no per-node sort) — same
    * semantics because the scores are sums of integral edge counts (exact
    * in double) and ties break on the smallest label in both spellings. */
  val q142 = Q("q142_label_prop", {
    val rounds = 3
    def stepSql(i: Int): String = {
      val prev = s"l${i - 1}"
      s"""c$i AS (SELECT und.u AS u, l.lbl AS lbl, sum(und.w) AS s
        |  FROM und JOIN $prev l ON l.node = und.v GROUP BY und.u, l.lbl),
        |l$i AS (SELECT u AS node, lbl FROM (
        |    SELECT u, lbl,
        |      row_number() OVER (PARTITION BY u ORDER BY s DESC, lbl) AS rn
        |    FROM c$i) r WHERE rn = 1)""".stripMargin
    }
    s"""WITH $edgesSql,
      |und AS (SELECT u, v, sum(w) AS w FROM (
      |    SELECT src AS u, dst AS v, w FROM edges
      |    UNION ALL SELECT dst AS u, src AS v, w FROM edges) s
      |  GROUP BY u, v),
      |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM und),
      |${(1 to rounds).map(stepSql).mkString(",\n")}
      |SELECT node, lbl AS community FROM l$rounds ORDER BY node""".stripMargin
  }) { (s, dir) =>
    Graph.labelPropagation(clickEdges(s, dir), "src", "dst", "w", rounds = 3)
      .orderBy(col("node"))
  }

  /** [[Graph.hits]]: three mutual-reinforcement rounds over the directed
    * click graph — hubs (pages whose outgoing transitions lead to
    * much-visited pages) vs authorities (pages reached from strong
    * hubs), the link-analysis complement of PageRank's single
    * importance score. The oracle unrolls the identical L1-normalized
    * rounds; 8dp rounding absorbs partition-order float drift, the Q
    * doc convention. */
  val q143 = Q("q143_hits", {
    val iters = 3
    def stepSql(i: Int): String = {
      val prev = s"h${i - 1}"
      s"""ar$i AS (SELECT e.dst AS node, sum(e.w * h.h) AS a
        |  FROM edges e JOIN $prev h ON h.node = e.src GROUP BY e.dst),
        |af$i AS (SELECT n.node, coalesce(ar.a, 0) AS a
        |  FROM nodes n LEFT JOIN ar$i ar ON ar.node = n.node),
        |a$i AS (SELECT node, a / (SELECT sum(a) FROM af$i) AS a FROM af$i),
        |hr$i AS (SELECT e.src AS node, sum(e.w * a.a) AS h
        |  FROM edges e JOIN a$i a ON a.node = e.dst GROUP BY e.src),
        |hf$i AS (SELECT n.node, coalesce(hr.h, 0) AS h
        |  FROM nodes n LEFT JOIN hr$i hr ON hr.node = n.node),
        |h$i AS (SELECT node, h / (SELECT sum(h) FROM hf$i) AS h FROM hf$i)"""
        .stripMargin
    }
    s"""WITH $edgesSql,
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges)),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |h0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS h FROM nodes),
      |${(1 to iters).map(stepSql).mkString(",\n")}
      |SELECT n.node, round(h.h, 8) AS hub, round(a.a, 8) AS auth
      |FROM nodes n JOIN h$iters h ON h.node = n.node
      |JOIN a$iters a ON a.node = n.node
      |ORDER BY n.node""".stripMargin
  }) { (s, dir) =>
    Graph.hits(clickEdges(s, dir), iters = 3)
      .select(col("node"), round(col("hub"), 8).as("hub"),
        round(col("auth"), 8).as("auth"))
      .orderBy(col("node"))
  }

  val all: Seq[Q] = Seq(q125, q129, q138, q139, q142, q143)
}
