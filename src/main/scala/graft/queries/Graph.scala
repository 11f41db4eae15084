package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryGroup, Tables}

/** Iterative graph analytics over a relationally-derived graph — the
  * "aggregate an edge list out of fact tables, then iterate a
  * fixed-point over it" shape (link-quality ranking a curation
  * pipeline runs over a domain/citation graph; reference has no graph
  * surface — this extends the engine per the BASELINE.json
  * north-star).
  *
  * `graph_nation_rank` builds a weighted directed trade graph —
  * customer-nation → supplier-nation, weight = revenue micros from
  * the full lineitem⋈orders⋈customer⋈supplier⋈nation join (the TPC-H
  * Q5 shape, undistilled) — and runs PAGE_ITERS rounds of weighted
  * PageRank over it. The heavy, corpus-scale work is the edge
  * aggregation (ordinary shuffle joins + one groupBy, linear in
  * lineitem); each iteration then runs on the aggregated edge list,
  * which for an entity-level graph (nations, domains, hosts) is tiny
  * — the scan cost does not multiply by iterations, the Pregel-style
  * contract.
  *
  * Cross-engine exactness: scores are integers at a 1e6 scale.
  * Per-edge contributions floor(score·w/wout), the damped update
  * base + floor(0.85·(inflow + floor(dangling/N))), and the seed
  * floor(1e6/N) all use the shared one-double-derivation discipline
  * (cast → IEEE mul/div → floor), so the DuckDB oracle replays the
  * unrolled iterations bit-for-bit. Σscore·w stays < 2^63 (score ≤
  * 1e6, w = corpus revenue micros), and the dangling term is exact
  * zero here (every node with in-edges also trades outward) but the
  * spec keeps it so the operator is total for any edge list.
  */
object Graph extends QueryGroup {

  private val PAGE_ITERS = 3
  private val DAMP = 0.85

  /** Fan-out / depth of the recursive reachability walk: 3 strongest
    * out-edges per nation, 4 hops — frontier ≤ 3^4 paths.
    */
  private val REACH_OUT = 3
  private val REACH_HOPS = 4


  /** (src, dst, w, wout, deg): aggregated trade edges with the
    * out-weight and out-degree joined on — computed once, reused by
    * every iteration. Package-visible so PlanContractsSpec can pin the
    * at-scale join shape (the checkpoint in the query hides it from
    * the final plan).
    */
  private[queries] def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_suppkey"),
      floor((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * 1000000)
        .cast("long").as("rev"))
    val custNation = broadcast(Tables(s, dir, "nation")
      .select(col("n_nationkey").as("cnk"), col("n_name").as("src")))
    val suppNation = broadcast(Tables(s, dir, "nation")
      .select(col("n_nationkey").as("snk"), col("n_name").as("dst")))
    li
      .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(custNation, col("c_nationkey") === col("cnk"))
      // supplier scales with SF (10k rows/SF) — no broadcast hint; let
      // size-based planning decide, so at 100 TB this joins keyed on
      // s_suppkey like q7's (pinned in PlanContractsSpec).
      .join(Tables(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("snk"))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("rev")).as("w"))
  }

  /** Co-purchase graph window: one shipdate year. The algorithm is
    * scale-invariant; the window keeps the bench fixture's wedge mass
    * (the irreducible cost of exact triangle counting, Σ C(outdeg,2))
    * proportionate to the rest of the inventory — the full-corpus
    * graph at sf0.1 carries 41M wedges for 1.2M edges (measured), the
    * 1995 window 13.4k wedges for 25.7k edges, same plan either way.
    */
  private val TRI_FROM = "1995-01-01"
  private val TRI_TO = "1996-01-01"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TRIANGLE COUNTING with degree-ordered orientation — the standard
    // distributed formulation (each undirected edge directed from its
    // lower-(degree, id) endpoint to the higher; every triangle then
    // has exactly ONE apex with two out-edges, so each is counted
    // once, and max out-degree is bounded by ~sqrt(2m) regardless of
    // hub degree — the hot-node bound that makes the wedge join safe
    // on power-law graphs). Graph: parts co-ordered in the same order
    // within the window year (edge list ∝ Σ C(order_width, 2), linear
    // in lineitem since order width is bounded). All three joins are
    // keyed equi-joins (wedge arms meet on the apex, the closing probe
    // on the (b, c) edge key); no broadcast hints — the edge list
    // scales with the data. Output: top-15 parts by triangle
    // participation with integer local clustering
    // floor(2·tri·1e6 / (d·(d−1))), ties by part key —
    // TakeOrderedAndProject, never a global sort.
    "graph_triangles" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit(TRI_FROM)) &&
          col("l_shipdate") < to_timestamp(lit(TRI_TO)))
        .select(col("l_orderkey"), col("l_partkey"))
      // Distinct undirected edges; checkpointed — feeds the degree
      // pass, both wedge arms, and the closing probe.
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("x"), col("b.l_partkey").as("y"))
        .distinct()
        .localCheckpoint(true)
      val deg = e.select(col("x").as("n")).unionByName(e.select(col("y").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val withDeg = e
        .join(deg.select(col("n").as("x"), col("d").as("dx")), "x")
        .join(deg.select(col("n").as("y"), col("d").as("dy")), "y")
      val xFirst = col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y"))
      // Oriented edge (s → t) with t's degree carried: the wedge-arm
      // ordering below must use ORIENTATION order (degree, id) — by id
      // alone, a wedge whose closing edge runs against id order would
      // never find its (b, c) row and the triangle would be lost.
      val o = withDeg.select(
          when(xFirst, col("x")).otherwise(col("y")).as("s"),
          when(xFirst, col("y")).otherwise(col("x")).as("t"),
          when(xFirst, col("dy")).otherwise(col("dx")).as("dt"))
        .localCheckpoint(true)
      val tri = o.as("o1").join(o.as("o2"),
          col("o1.s") === col("o2.s") &&
            (col("o1.dt") < col("o2.dt") ||
              (col("o1.dt") === col("o2.dt") && col("o1.t") < col("o2.t"))))
        .select(col("o1.s").as("ta"), col("o1.t").as("tb"), col("o2.t").as("tc"))
        .join(o.as("o3"),
          col("tb") === col("o3.s") && col("tc") === col("o3.t"))
        .select(col("ta"), col("tb"), col("tc"))
      val perVertex = tri
        .select(explode(array(col("ta"), col("tb"), col("tc"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))
      perVertex.join(deg, "n")
        .withColumn("clustering_ppm",
          expr("n_triangles * 2000000 DIV (d * (d - 1))"))
        .select(col("n").as("p_partkey"), col("n_triangles"),
          col("d").as("degree"), col("clustering_ppm"))
        .orderBy(col("n_triangles").desc, col("p_partkey"))
        .limit(15)
    }),

    "graph_nation_rank" -> ((s, dir) => {
      val e = tradeEdges(s, dir).localCheckpoint(true)
      val out = e.groupBy(col("src"))
        .agg(sum(col("w")).as("wout"), count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val nodes = e.select(col("src").as("nation"))
        .union(e.select(col("dst").as("nation")))
        .distinct().localCheckpoint(true)
      // Node count is a model parameter of the iteration (like the BPE
      // argmax), not a data-plane collect: one long for the seed/base
      // constants, identical to the oracle's scalar-subquery derivation.
      val n = nodes.count()
      val init = math.floor(1000000.0 / n).toLong
      val base = math.floor(150000.0 / n).toLong
      val en = e.join(out.select(col("src"), col("wout")), Seq("src"))
      var r = nodes.withColumn("score", lit(init))
      (1 to PAGE_ITERS).foreach { _ =>
        // Dangling mass: nodes with in-edges only redistribute
        // uniformly (exactly zero on this data; kept for totality).
        val dangling = r
          .join(out.select(col("src").as("nation")), Seq("nation"), "left_anti")
          .agg(coalesce(sum(col("score")), lit(0L)).as("d"))
        val inflow = en
          .join(r.withColumnRenamed("nation", "src"), Seq("src"))
          .select(col("dst"),
            floor(col("score").cast("double") * col("w").cast("double")
              / col("wout").cast("double")).cast("long").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
        r = nodes
          .join(inflow.withColumnRenamed("dst", "nation"), Seq("nation"), "left")
          .crossJoin(dangling)
          .withColumn("score",
            lit(base) + floor(lit(DAMP) *
              (coalesce(col("inflow"), lit(0L)) +
                floor(col("d").cast("double") / lit(n.toDouble)).cast("long"))
                .cast("double")).cast("long"))
          .select(col("nation"), col("score"))
          .localCheckpoint(true) // bound lineage per round (25-row frame)
      }
      val wr = Window.orderBy(col("score").desc, col("nation"))
      r.join(out.withColumnRenamed("src", "nation"), Seq("nation"), "left")
        .withColumn("rank", row_number().over(wr).cast("long"))
        .select(col("rank"), col("nation"), col("score"),
          coalesce(col("deg"), lit(0L)).as("n_partners"),
          coalesce(col("wout"), lit(0L)).as("trade_out_micros"))
        .orderBy(col("rank"))
    }),

    // RECURSIVE-CTE BFS — SQL-level iteration (Spark 4's WITH
    // RECURSIVE), the surface complement of the DataFrame fixpoint
    // loops (PageRank, connected components): min-hop distances from
    // the lexicographically first nation over the STRONG trade graph
    // (each nation keeps only its top-[[REACH_OUT]] outgoing edges by
    // weight — the full Q7-shape graph is near-complete, so the
    // pruned graph is what gives BFS real multi-hop structure). The
    // corpus-scale work is the ONE edge aggregation (shared
    // derivation with graph_nation_rank); the recursion walks a
    // ≤25-node quotient graph with fan-out [[REACH_OUT]] and depth
    // cap [[REACH_HOPS]], so the UNION ALL frontier is bounded by
    // REACH_OUT^REACH_HOPS rows whatever the corpus size — the
    // aggregate-then-recurse shape. Unreachable nations are absent;
    // MIN(depth) outside the recursion turns path enumeration into
    // distances. DuckDB runs the identical recursion.
    "graph_reachability_sql" -> ((s, dir) => {
      val wTop = Window.partitionBy(col("src"))
        .orderBy(col("w").desc, col("dst"))
      val edges = tradeEdges(s, dir)
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= REACH_OUT)
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
      val source = edges.agg(min(col("src"))).head().getString(0)
      edges.createOrReplaceTempView("graft_reach_edges")
      s.sql(
        s"""WITH RECURSIVE walk(nation, depth) AS (
              SELECT CAST('$source' AS STRING), 0
              UNION ALL
              SELECT g.dst, w.depth + 1
              FROM walk w JOIN graft_reach_edges g ON g.src = w.nation
              WHERE w.depth < $REACH_HOPS)
            SELECT nation, CAST(MIN(depth) AS BIGINT) AS hops
            FROM walk GROUP BY nation ORDER BY hops, nation""")
    }))

  /** One unrolled PageRank iteration as CTEs — mirror of the Spark
    * loop body.
    */
  private def prIterSql(i: Int): String =
    s"""d$i AS (SELECT COALESCE(SUM(r.score), 0) AS d FROM r${i - 1} r
          LEFT JOIN outw o ON o.src = r.nation WHERE o.src IS NULL),
        inf$i AS (SELECT e.dst AS nation,
            CAST(SUM(CAST(floor(CAST(r.score AS DOUBLE) * CAST(e.w AS DOUBLE)
              / CAST(e.wout AS DOUBLE)) AS BIGINT)) AS BIGINT) AS inflow
          FROM en e JOIN r${i - 1} r ON r.nation = e.src GROUP BY 1),
        r$i AS (SELECT n.nation,
            (SELECT base FROM consts) +
            CAST(floor($DAMP * CAST(COALESCE(i.inflow, 0) +
              CAST(floor(CAST((SELECT d FROM d$i) AS DOUBLE)
                / (SELECT nd FROM consts)) AS BIGINT) AS DOUBLE)) AS BIGINT) AS score
          FROM nodes n LEFT JOIN inf$i i ON i.nation = n.nation)"""

  val oracles: Map[String, String] = Map(
    "graph_triangles" ->
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '$TRI_FROM'
                AND l_shipdate < TIMESTAMP '$TRI_TO'),
          e AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
                FROM li a JOIN li b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
          deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d
                  FROM (SELECT x AS n FROM e UNION ALL SELECT y AS n FROM e)
                  GROUP BY 1),
          o AS (SELECT
                  CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN e.x ELSE e.y END AS s,
                  CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN e.y ELSE e.x END AS t,
                  CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN dy.d ELSE dx.d END AS dt
                FROM e JOIN deg dx ON dx.n = e.x JOIN deg dy ON dy.n = e.y),
          tri AS (SELECT o1.s AS ta, o1.t AS tb, o2.t AS tc
                  FROM o o1 JOIN o o2
                    ON o1.s = o2.s AND (o1.dt, o1.t) < (o2.dt, o2.t)
                  JOIN o o3 ON o3.s = o1.t AND o3.t = o2.t),
          tv AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS n_triangles
                 FROM (SELECT ta AS n FROM tri UNION ALL
                       SELECT tb AS n FROM tri UNION ALL
                       SELECT tc AS n FROM tri) GROUP BY 1)
          SELECT tv.n AS p_partkey, tv.n_triangles, deg.d AS degree,
            tv.n_triangles * 2000000 // (deg.d * (deg.d - 1)) AS clustering_ppm
          FROM tv JOIN deg ON deg.n = tv.n
          ORDER BY tv.n_triangles DESC, p_partkey LIMIT 15""",
    "graph_nation_rank" ->
      s"""WITH e AS (SELECT cn.n_name AS src, sn.n_name AS dst,
              CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS w
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation cn ON cn.n_nationkey = c.c_nationkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation sn ON sn.n_nationkey = s.s_nationkey
            GROUP BY 1, 2),
          outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout, COUNT(*) AS deg
                   FROM e GROUP BY 1),
          en AS (SELECT e.src, e.dst, e.w, o.wout FROM e JOIN outw o ON o.src = e.src),
          nodes AS (SELECT DISTINCT src AS nation FROM e
                    UNION SELECT DISTINCT dst AS nation FROM e),
          consts AS (SELECT COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) AS nd,
              CAST(floor(1000000.0 / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS init,
              CAST(floor(150000.0 / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS base
            FROM nodes),
          r0 AS (SELECT nation, (SELECT init FROM consts) AS score FROM nodes),
          ${(1 to PAGE_ITERS).map(prIterSql).mkString(",\n          ")}
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY r.score DESC, r.nation) AS BIGINT) AS rank,
            r.nation, r.score,
            COALESCE(o.deg, 0) AS n_partners,
            COALESCE(o.wout, 0) AS trade_out_micros
          FROM r$PAGE_ITERS r LEFT JOIN outw o ON o.src = r.nation
          ORDER BY rank""",
    // Same edge derivation, same top-REACH_OUT pruning, and the
    // IDENTICAL recursion in DuckDB — the engines must agree on the
    // pruned graph, the source pick, the bounded frontier, and the
    // min-hop rollup.
    "graph_reachability_sql" ->
      s"""WITH RECURSIVE e AS (SELECT cn.n_name AS src, sn.n_name AS dst,
              CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS w
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation cn ON cn.n_nationkey = c.c_nationkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation sn ON sn.n_nationkey = s.s_nationkey
            GROUP BY 1, 2),
          t AS (SELECT src, dst,
                  ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
                FROM e),
          g AS (SELECT src, dst FROM t WHERE rn <= $REACH_OUT),
          walk(nation, depth) AS (
            SELECT s.s, 0 FROM (SELECT MIN(src) AS s FROM g) s
            UNION ALL
            SELECT g.dst, w.depth + 1
            FROM walk w JOIN g ON g.src = w.nation
            WHERE w.depth < $REACH_HOPS)
          SELECT nation, CAST(MIN(depth) AS BIGINT) AS hops
          FROM walk GROUP BY nation ORDER BY hops, nation""")
}
