package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._

/** Link-graph analytics — the authority-scoring step of a web-curation
  * pipeline (Common-Crawl-style domain ranking feeding per-document
  * quality weights). Declared extension surface; absent from the
  * reference (SURVEY.md §2.9).
  *
  * Scale design: PageRank at 100 TB is iterated (join on src → groupBy
  * dst) over an edge table that dwarfs the rank vector. The shape here
  * is exactly that — the edge list is hash-partitioned on `src` ONCE
  * and persisted; every iteration's join then reuses the layout, and
  * each aggregate output is already partitioned on the node key it
  * feeds the next round with. No windows, no driver-side iteration
  * state (node count enters as a broadcast 1-row aggregate, the q21r
  * pattern), fixed iteration count so the whole rank computation is one
  * lazy DAG.
  *
  * Exactness: ranks are fixed-point BIGINTs (SCALE = 10^12). Every
  * operation is integer multiply / integer divide on positive values,
  * where Spark's `DIV` and DuckDB's `//` agree bit-for-bit — float
  * summation order never enters, so the oracle hash-matches exactly
  * despite 5 rounds of distributed aggregation.
  */
object Graph {

  /** Fixed-point scale for rank mass: 10^12 keeps six significant
    * digits after the per-edge integer division even for out-degrees in
    * the thousands, while 85 * SCALE stays far below Long.MaxValue. */
  private val Scale = 1000000000000L

  private val Iters = 5

  /** gr01 — PageRank over the customer↔supplier purchase graph (damping
    * 0.85, 5 synchronous iterations, undirected edges from distinct
    * (customer, supplier) order lines; node ids disambiguated by parity:
    * customer c → 2c, supplier s → 2s+1). Output: every supplier node's
    * fixed-point rank, descending — the "domain authority" table a
    * curation pipeline would join document weights against.
    *
    * Dangling-node note: undirected edges mean every node in the graph
    * has out-degree ≥ 1, so no rank mass ever dangles and the
    * sum-over-in-neighbors form needs no special case — the property
    * that makes the single join+agg per iteration sufficient. */
  /** Iteration core shared by gr01 and the 20-iteration lineage spec.
    * Returns the rank table (node, outdeg, base, rank) after `iters`
    * synchronous rounds.
    *
    * Lineage truncation: each iteration adds a join+agg to the lazy DAG;
    * past ~8 rounds the growing lineage inflates planning time and risks
    * stack-depth blowups at 100 TB PageRank iteration counts (20+). So
    * every [[CheckpointEvery]] rounds the rank table is
    * `localCheckpoint`ed (the dd05 pointer-jumping / GlobalCumsum
    * pattern) — the rank vector is tiny next to the edge table, so
    * materializing it is cheap, and the persisted `edges` layout is
    * untouched. Below the threshold the DAG stays fully lazy, which
    * keeps gr01's 5-round oracle plan a single DAG. */
  private val CheckpointEvery = 8

  private[graft] def pageRankRanks(
      s: org.apache.spark.sql.SparkSession, d: String, iters: Int)
      : org.apache.spark.sql.DataFrame = {
    val pairs = T.orders(s, d)
      .join(T.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
      .distinct()
    // Partitioned on src once; every iteration join and the degree
    // aggregate reuse this exchange instead of re-shuffling the edges.
    // both edge directions from ONE evaluation of the orders⋈lineitem
    // chain (r16 verdict #5): the unionAll form ran that join + distinct
    // once per direction before the persist materialized it
    val edges = pairs
      .select(explode(array(
        struct((col("c") * 2).as("src"), (col("sk") * 2 + 1).as("dst")),
        struct((col("sk") * 2 + 1).as("src"), (col("c") * 2).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
      .repartition(col("src"))
      .persist()
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    // Node count as a broadcast 1-row aggregate — never a driver action.
    val baseDf = deg.agg(expr(s"${Scale}L DIV count(1)").as("base"))
    // The rank-vector side is TINY next to the edge table and appears in
    // every iteration's plan (the per-round join and the dangling-free
    // base); persisting it once keeps each round's plan a cached scan +
    // one shuffle instead of re-deriving deg from the edge table per
    // reference (exchange reuse catches some of that, but the cached
    // form also halves the unrolled plan the final action must compile).
    val nodes = deg.crossJoin(broadcast(baseDf)).persist()
    var ranks = nodes.withColumn("rank", col("base"))
    for (i <- 1 to iters) {
      val msgs = edges
        .join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("rank DIV outdeg").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg(sum("contrib").as("msg"))
      ranks = nodes
        .join(msgs, "node")
        .select(col("node"), col("outdeg"), col("base"),
          expr("(15 * base) DIV 100 + (85 * msg) DIV 100").as("rank"))
      if (i % CheckpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  val gr01 = QueryDef.sql("gr01_pagerank_authority",
    s"""WITH pairs AS (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |edges AS (
       |  SELECT 2*c AS src, 2*sk+1 AS dst FROM pairs
       |  UNION ALL
       |  SELECT 2*sk+1 AS src, 2*c AS dst FROM pairs),
       |deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |base AS (SELECT CAST($Scale AS BIGINT) // COUNT(*) AS base FROM deg),
       |r0 AS (SELECT node, outdeg, (SELECT base FROM base) AS rank FROM deg),
       |r1 AS (
       |  SELECT d.node, d.outdeg,
       |    CAST((15 * (SELECT base FROM base)) // 100 + (85 * m.msg) // 100 AS BIGINT) AS rank
       |  FROM (SELECT e.dst AS node, SUM(r.rank // r.outdeg) AS msg
       |        FROM edges e JOIN r0 r ON e.src = r.node GROUP BY e.dst) m
       |  JOIN deg d ON m.node = d.node),
       |r2 AS (
       |  SELECT d.node, d.outdeg,
       |    CAST((15 * (SELECT base FROM base)) // 100 + (85 * m.msg) // 100 AS BIGINT) AS rank
       |  FROM (SELECT e.dst AS node, SUM(r.rank // r.outdeg) AS msg
       |        FROM edges e JOIN r1 r ON e.src = r.node GROUP BY e.dst) m
       |  JOIN deg d ON m.node = d.node),
       |r3 AS (
       |  SELECT d.node, d.outdeg,
       |    CAST((15 * (SELECT base FROM base)) // 100 + (85 * m.msg) // 100 AS BIGINT) AS rank
       |  FROM (SELECT e.dst AS node, SUM(r.rank // r.outdeg) AS msg
       |        FROM edges e JOIN r2 r ON e.src = r.node GROUP BY e.dst) m
       |  JOIN deg d ON m.node = d.node),
       |r4 AS (
       |  SELECT d.node, d.outdeg,
       |    CAST((15 * (SELECT base FROM base)) // 100 + (85 * m.msg) // 100 AS BIGINT) AS rank
       |  FROM (SELECT e.dst AS node, SUM(r.rank // r.outdeg) AS msg
       |        FROM edges e JOIN r3 r ON e.src = r.node GROUP BY e.dst) m
       |  JOIN deg d ON m.node = d.node),
       |r5 AS (
       |  SELECT d.node, d.outdeg,
       |    CAST((15 * (SELECT base FROM base)) // 100 + (85 * m.msg) // 100 AS BIGINT) AS rank
       |  FROM (SELECT e.dst AS node, SUM(r.rank // r.outdeg) AS msg
       |        FROM edges e JOIN r4 r ON e.src = r.node GROUP BY e.dst) m
       |  JOIN deg d ON m.node = d.node)
       |SELECT (r.node - 1) // 2 AS s_suppkey, s.s_name, r.rank AS rank_fp
       |FROM r5 r JOIN supplier s ON (r.node - 1) // 2 = s.s_suppkey
       |WHERE r.node % 2 = 1
       |ORDER BY rank_fp DESC, s_suppkey""".stripMargin) { (s, d) =>
    pageRankRanks(s, d, Iters)
      .filter(col("node") % 2 === 1)
      .select(expr("(node - 1) DIV 2").as("s_suppkey"), col("rank").as("rank_fp"))
      .join(broadcast(T.supplier(s, d)), "s_suppkey")
      .select(col("s_suppkey"), col("s_name"), col("rank_fp"))
      .orderBy(col("rank_fp").desc, col("s_suppkey"))
  }

  /** gr02 — connected components over the HIGH-VALUE co-purchase graph:
    * customers and suppliers linked by order lines whose order totals
    * ≥ 498 000 (top ~0.3% of orders), labeled with their component's
    * minimum node id plus the component size. The supply-chain-cluster /
    * collusion-screen query of a curation pipeline's entity-graph stage:
    * thresholding first SPARSIFIES the graph (the full bipartite graph
    * is one giant component and says nothing), then the component
    * structure is the signal.
    *
    * Shape: reuses [[Dedup.connectedComponents]] — dd05's min-label
    * propagation core (one equi-join + min-agg per round, convergence
    * piggybacked on the same job, pointer-jumping insurance for deep
    * chains) — on a different domain graph; the component-size column is
    * a window over the tiny (node, label) table, never over edges. The
    * oracle recomputes the same fixpoint as a recursive CTE (the dd05
    * pattern) over the identically-encoded node ids (customer c → 2c,
    * supplier s → 2s+1, gr01's parity trick). */
  val gr02 = QueryDef.sql("gr02_copurchase_components",
    """WITH RECURSIVE hv AS (
      |  SELECT o_orderkey, o_custkey FROM orders
      |  WHERE o_totalprice >= 498000e0),
      |p AS (
      |  SELECT DISTINCT 2*h.o_custkey AS a, 2*l.l_suppkey+1 AS b
      |  FROM hv h JOIN lineitem l ON h.o_orderkey = l.l_orderkey),
      |edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
      |reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |lab AS (
      |  SELECT a AS node_id, CAST(least(a, MIN(b)) AS BIGINT) AS component_id
      |  FROM reach GROUP BY a)
      |SELECT node_id, component_id,
      |  CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT) AS component_size
      |FROM lab
      |ORDER BY component_id, node_id""".stripMargin) { (s, d) =>
    val pairs = T.orders(s, d)
      .filter(col("o_totalprice") >= 498000.0)
      .join(T.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("da"),
        (col("l_suppkey") * 2 + 1).as("db"))
      .distinct()
    // co-purchase chains are DEEPER than dedup components (bipartite
    // customer-supplier paths), and the cost here is ~10 synchronous
    // rounds of scheduler floor, not data volume — so jump pointers
    // from round 0 (halves remaining depth per round → O(log diameter)
    // rounds) and batch the convergence count every 2 rounds (halves
    // driver round trips). Labels at fixpoint are min-id per component
    // regardless of round count, so the oracle hash is unchanged.
    val lab = Dedup.connectedComponents(pairs, jumpAfter = 0, checkEvery = 2)
      .select(col("id").as("node_id"), col("label").as("component_id"))
    lab.withColumn("component_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("component_id")))
      .orderBy("component_id", "node_id")
  }

  /** gr03 — triangle census of the near-duplicate graph: per-document
    * triangle participation counts over the Jaccard ≥ 0.3 pair graph
    * (docs as nodes, verified near-dup pairs as edges). Triangles
    * measure the TRANSITIVITY of the near-dup relation — how cliquish
    * duplicate neighborhoods are — which is the audit that tells a
    * dedup pipeline whether single-link clustering (dd05) is safe or
    * will chain unrelated docs through sparse bridges: high triangle
    * density around a doc ⇒ its neighborhood is a genuine clique;
    * triangle-free chains ⇒ bridge risk.
    *
    * Shape: edges come from the SHARED memoized pair table
    * ([[Dedup.jaccardPairs]] — prefix-filtered candidates, stats-chosen
    * broadcast verify), already oriented da < db, so the triangle join
    * is the standard ordered 3-way equi-join e1(u,v) ⨝ e2(v,w) ⨝
    * e3(u,w) with u < v < w — each triangle materializes exactly once,
    * no orientation pass needed. Edge count is the near-dup pair count
    * (a corpus property that stays FAR below all-pairs at any scale —
    * 25 edges at sf0.01, 256 at sf0.1), so the join is never the
    * bottleneck; the pair table build it reuses is. Per-doc counts via
    * explode of the 3 corners + one agg. */
  val gr03 = QueryDef.sql("gr03_neardup_triangles",
    s"""WITH ${Dedup.jaccardCte},
       |e AS (SELECT da AS u, db AS v FROM jac WHERE jaccard >= 0.3e0),
       |tri AS (
       |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM e e1 JOIN e e2 ON e1.v = e2.u
       |            JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v),
       |corners AS (
       |  SELECT UNNEST([a, b, c]) AS doc_id FROM tri)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tri_count
       |FROM corners
       |GROUP BY doc_id
       |ORDER BY tri_count DESC, doc_id""".stripMargin) { (s, d) =>
    triangleCounts(
      Dedup.jaccardPairs(s, d)
        .filter(Dedup.jaccardAtLeast(0.3))
        .select(col("da").as("u"), col("db").as("v")))
  }

  /** Per-node triangle participation over an edge list already oriented
    * u < v (each triangle joins exactly once as u < v < w). Factored
    * for gr03 and its synthetic-graph spec. */
  private[graft] def triangleCounts(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("tri_count"))
      .orderBy(col("tri_count").desc, col("doc_id"))
  }

  val defs: Seq[QueryDef] = Seq(gr01, gr02, gr03)
}
