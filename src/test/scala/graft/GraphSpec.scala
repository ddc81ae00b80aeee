package graft

/** q_pagerank's DuckDB oracle unrolls the SAME recurrence the Spark
  * loop runs, so (as with SkylineSpec) the hash match alone can't
  * catch a shared modeling error. This spec recomputes the rank from
  * the raw sf0.001 tables with a straight-line in-memory power
  * iteration — textbook damped PageRank over out-weight-normalized
  * transition probabilities — and requires node-wise agreement.
  */
class GraphSpec extends SparkSpec {

  test("q_pagerank equals an in-memory power iteration at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    def read(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    val got = SparkEntry.queries("q_pagerank")(spark, dir)
      .collect().map(r => r.getAs[Number](0).longValue -> r.getDouble(1)).toMap

    val custNation = read("customer").select("c_custkey", "c_nationkey")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val suppNation = read("supplier").select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val orderCust = read("orders").select("o_orderkey", "o_custkey")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val nodes = read("nation").select("n_nationkey")
      .collect().map(_.getAs[Number](0).longValue).sorted

    // Edge weights: one count per (customer nation, supplier nation)
    // line item, exactly the query's fact-table join.
    val w = read("lineitem").select("l_orderkey", "l_suppkey").collect()
      .flatMap { r =>
        orderCust.get(r.getAs[Number](0).longValue).map { ck =>
          (custNation(ck), suppNation(r.getAs[Number](1).longValue)) -> 1.0
        }
      }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val outW = w.groupMapReduce(_._1._1)(_._2)(_ + _)
    val p = w.map { case ((src, dst), cnt) => (src, dst) -> cnt / outW(src) }

    val nn = nodes.size.toDouble
    var pr = nodes.map(_ -> 1.0 / nn).toMap
    for (_ <- 1 to 5) {
      val inMass = p.toSeq
        .map { case ((src, dst), prob) => dst -> prob * pr(src) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      pr = nodes.map(v => v -> (0.15 / nn + 0.85 * inMass.getOrElse(v, 0.0))).toMap
    }

    assert(got.keySet == nodes.toSet)
    for (v <- nodes) {
      assert(math.abs(got(v) - pr(v)) <= 1e-6,
        s"node $v: query ${got(v)} vs power iteration ${pr(v)}")
    }
    // Rank mass stays a proper distribution up to dangling leak and
    // the per-node round-to-1e-6 (each node can carry +5e-7).
    val slack = nodes.size * 5e-7
    val total = got.values.sum
    assert(total > 0.5 && total <= 1.0 + slack, s"total rank mass $total")
  }

  test("q_kcore equals an in-memory peel run to convergence at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    def read(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    // distinct co-purchase pairs, straight from the raw tables
    val baskets = read("lineitem").select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .distinct.groupBy(_._1).values.map(_.map(_._2).sorted)
    val edges = baskets.flatMap(ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // the same adaptive threshold: ceil of the interpolated p75 of
    // initial degrees (the percentile/quantile_cont formula)
    val degs = adj.values.map(_.size.toDouble).toSeq.sorted
    val rank = 0.75 * (degs.length - 1)
    val (lo, hi) = (degs(rank.toInt), degs(math.ceil(rank).toInt))
    val k = math.ceil(lo + (rank - rank.toInt) * (hi - lo)).toLong

    // peel to FIXPOINT (not 6 rounds) — proves the query's fixed
    // unroll reaches the true k-core on this corpus
    var surv = adj.filter(_._2.size >= k).keySet
    var rounds = 0
    var changed = true
    while (changed) {
      val next = surv.filter(v => adj(v).count(surv) >= k)
      changed = next != surv
      surv = next
      rounds += 1
    }
    assert(rounds <= 7, s"peeling needed $rounds rounds; the query unrolls 6")

    val got = SparkEntry.queries("q_kcore")(spark, dir)
      .collect().map(r => r.getAs[Number](0).longValue ->
        ((r.getAs[Long]("deg_core"), r.getAs[Long]("k")))).toMap
    assert(got.keySet == surv, s"core size ${got.size} vs in-memory ${surv.size}")
    got.foreach { case (v, (dg, kGot)) =>
      assert(kGot == k, s"threshold $kGot vs $k")
      assert(dg == adj(v).count(surv), s"node $v residual degree")
    }
  }

  test("q_label_propagation equals an in-memory synchronous LPA at sf0.001") {
    // The oracle unrolls the same recurrence, so this recomputes the
    // 3 synchronous rounds from the raw tables with plain collections
    // — weighted argmax adoption, smallest-label ties — and requires
    // the exact community histogram.
    val dir = "/root/testdata/sf0.001"
    val baskets = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .distinct.groupBy(_._1).values.map(_.map(_._2).sorted)
    val w = baskets.flatMap(ps =>
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val edges = w.toSeq.flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
    val byNode = edges.groupBy(_._1)
    var lab = byNode.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lab = byNode.map { case (v, es) =>
        val wt = es.groupMapReduce(e => lab(e._2))(_._3)(_ + _)
        v -> wt.toSeq.minBy { case (l, s) => (-s, l) }._1
      }
    }
    val expected = lab.groupBy(_._2).map { case (c, m) =>
      c -> ((m.size.toLong, m.keys.sum))
    }
    val got = SparkEntry.queries("q_label_propagation")(spark, dir)
      .collect().map(r => r.getAs[Number](0).longValue ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("member_sum")))).toMap
    assert(got == expected,
      s"${got.size} communities vs in-memory ${expected.size}")
  }

  test("q_link_prediction equals an in-memory Adamic-Adar at sf0.001") {
    // From-scratch wedge enumeration with the same top-10-strongest-
    // neighbor truncation: catches a wrong degree table, a missed
    // anti-join (an existing edge predicted), a wrong truncation
    // order, or a wedge outside the kept adjacency leaking through.
    val dir = "/root/testdata/sf0.001"
    val baskets = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .distinct.groupBy(_._1).values.map(_.map(_._2).sorted)
    val w = baskets.flatMap(ps =>
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairSet = w.keySet
    val adjW = w.toSeq.flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
      .groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
    val deg = adjW.view.mapValues(_.size.toLong).toMap
    val scores = new scala.collection.mutable.HashMap[(Long, Long), (Long, Double)]()
    adjW.foreach { case (v, nsw) =>
      val ns = nsw.sortBy { case (dst, wt) => (-wt, dst) }.take(10).map(_._1)
      val term = 1.0 / math.log(deg(v).toDouble)
      for (i <- ns.indices; j <- ns.indices if ns(i) < ns(j)) {
        val k = if (ns(i) < ns(j)) (ns(i), ns(j)) else (ns(j), ns(i))
        val (c, s0) = scores.getOrElse(k, (0L, 0.0))
        scores(k) = (c + 1, s0 + term)
      }
    }
    val expected = scores.filter { case (k, _) => !pairSet.contains(k) }
    val got = SparkEntry.queries("q_link_prediction")(spark, dir).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) ->
        ((r.getAs[Long]("n_common"), r.getAs[Double]("aa_score"))))
    assert(got.nonEmpty)
    // every emitted pair: correct wedge count, score within rounding,
    // and genuinely a non-edge
    got.foreach { case (k, (n, s)) =>
      assert(!pairSet.contains(k), s"predicted existing edge $k")
      val (en, es) = expected(k)
      assert(n == en, s"$k: n_common $n vs $en")
      assert(math.abs(s - es) < 1e-5, s"$k: score $s vs $es")
    }
    // and the emitted list IS the global top-k: no unemitted candidate
    // scores strictly above the last emitted score
    val floor = got.map(_._2._2).min
    val above = expected.count { case (_, (_, es)) =>
      math.rint(es * 1e6) / 1e6 > floor }
    assert(above <= got.length, s"$above candidates above emitted floor $floor")
  }

  test("q_hits equals an in-memory HITS run at sf0.001") {
    // From-scratch Kleinberg iteration on the bipartite customer→part
    // edge set: catches a missed normalization, a transposed
    // half-step, or a wrong edge build. The engine accumulates sums
    // as DECIMAL; this replica uses plain doubles, so scores agree to
    // 1e-6, not bitwise.
    val dir = "/root/testdata/sf0.001"
    def read(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val orderCust = read("orders").select("o_orderkey", "o_custkey")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val edges = read("lineitem").select("l_orderkey", "l_partkey").collect()
      .flatMap(r => orderCust.get(r.getAs[Number](0).longValue)
        .map(c => (c, r.getAs[Number](1).longValue)))
      .distinct
    val byC = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val byP = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    def l2(m: Map[Long, Double]) = {
      val z = math.sqrt(m.values.map(v => v * v).sum)
      m.view.mapValues(_ / z).toMap
    }
    var hub = byC.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 2) {
      val auth = l2(byP.map { case (p, cs) => p -> cs.map(hub).sum })
      hub = l2(byC.map { case (c, ps) => c -> ps.map(auth).sum })
    }
    val af = l2(byP.map { case (p, cs) => p -> cs.map(hub).sum })
    val expTop = af.toSeq
      .sortBy { case (p, s) => (-math.rint(s * 1e6) / 1e6, p) }.take(15)
    val got = SparkEntry.queries("q_hits")(spark, dir).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("n_buyers"),
        r.getAs[Double]("authority")))
    assert(got.length == 15)
    got.zip(expTop).foreach { case ((p, nb, s), (ep, es)) =>
      assert(p == ep, s"rank order: part $p vs expected $ep")
      assert(nb == byP(p).length.toLong, s"part $p n_buyers")
      assert(math.abs(s - es) < 1e-6, s"part $p authority $s vs $es")
    }
  }

  test("q_bfs_hops equals an in-memory multi-source BFS at sf0.001") {
    // Same basket-pair graph, same deterministic 5-source seed rule
    // (degree desc, id), 3 min-hop rounds replayed in plain
    // collections; the histogram plus per-hop membership checksum
    // must match exactly — all integers, no tolerance.
    val dir = "/root/testdata/sf0.001"
    val baskets = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .distinct.groupBy(_._1).values.map(_.map(_._2).sorted)
    val pairSet = baskets.flatMap(ps =>
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .toSet
    val adj = pairSet.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val seeds = deg.toSeq.sortBy { case (v, d) => (-d, v) }.take(5).map(_._1)
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val next = dist.toSeq.flatMap { case (v, h) =>
        (v, h) +: adj(v).map(_ -> (h + 1)) }
      dist = next.groupMapReduce(_._1)(_._2)(math.min)
    }
    val hist = dist.groupBy(_._2).map { case (h, m) =>
      h -> ((m.size.toLong, m.keys.sum)) }
    val unreachedNodes = deg.keySet -- dist.keySet
    val expected = hist ++ (
      if (unreachedNodes.nonEmpty)
        Map(-1L -> ((unreachedNodes.size.toLong, unreachedNodes.sum)))
      else Map(-1L -> ((0L, 0L))))
    val got = SparkEntry.queries("q_bfs_hops")(spark, dir).collect()
      .map(r => r.getAs[Long]("hop") ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("node_sum")))).toMap
    assert(got == expected, s"got $got vs $expected")
  }

  test("q_graph_modularity equals a from-scratch weighted Newman Q at sf0.001") {
    // Recompute the 3-round LPA labels AND the modularity sum in plain
    // collections — catches a wrong intra/strength join, a m2 that
    // counts undirected weight once, or label drift between the
    // detector and the gate.
    val dir = "/root/testdata/sf0.001"
    val baskets = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .distinct.groupBy(_._1).values.map(_.map(_._2).sorted)
    val w = baskets.flatMap(ps =>
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val edges = w.toSeq.flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
    val byNode = edges.groupBy(_._1)
    var lab = byNode.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lab = byNode.map { case (v, es) =>
        val wt = es.groupMapReduce(e => lab(e._2))(_._3)(_ + _)
        v -> wt.toSeq.minBy { case (l, s) => (-s, l) }._1
      }
    }
    val m2 = edges.map(_._3).sum.toDouble
    val byComm = edges.groupBy(e => lab(e._1))
    val expected = byComm.map { case (c, es) =>
      val intra = es.filter(e => lab(e._2) == c).map(_._3).sum
      val strength = es.map(_._3).sum
      c -> ((intra, strength,
        intra / m2 - (strength / m2) * (strength / m2)))
    }
    val qTotal = expected.values.map(_._3).sum
    val got = SparkEntry.queries("q_graph_modularity")(spark, dir).collect()
    assert(got.map(_.getAs[Number]("community").longValue).toSet == expected.keySet)
    got.foreach { r =>
      val c = r.getAs[Number]("community").longValue
      val (ei, es, ec) = expected(c)
      assert(r.getAs[Long]("intra_w") == ei, s"community $c intra")
      assert(r.getAs[Long]("strength") == es, s"community $c strength")
      assert(math.abs(r.getAs[Double]("contrib") - ec) <= 1e-6, s"community $c contrib")
      assert(math.abs(r.getAs[Double]("q_total") - qTotal) <= 1e-6, "total Q")
    }
  }

  test("q_pagerank_personalized equals an in-memory seeded power iteration " +
    "at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    def read(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val custNation = read("customer").select("c_custkey", "c_nationkey")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val suppNation = read("supplier").select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val orderCust = read("orders").select("o_orderkey", "o_custkey")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val nodes = read("nation").select("n_nationkey")
      .collect().map(_.getAs[Number](0).longValue).sorted
    val w = read("lineitem").select("l_orderkey", "l_suppkey").collect()
      .flatMap { r =>
        orderCust.get(r.getAs[Number](0).longValue).map { ck =>
          (custNation(ck), suppNation(r.getAs[Number](1).longValue)) -> 1.0
        }
      }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val outW = w.groupMapReduce(_._1._1)(_._2)(_ + _)
    val p = w.map { case ((src, dst), cnt) => (src, dst) -> cnt / outW(src) }
    val seeds = nodes.filter(_ < 5)
    val rst = nodes.map(v => v ->
      (if (v < 5) 1.0 / seeds.size else 0.0)).toMap
    var pr = rst
    for (_ <- 1 to 5) {
      val inMass = p.toSeq
        .map { case ((src, dst), prob) => dst -> prob * pr(src) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      pr = nodes.map(v => v ->
        (0.15 * rst(v) + 0.85 * inMass.getOrElse(v, 0.0))).toMap
    }
    val got = SparkEntry.queries("q_pagerank_personalized")(spark, dir)
      .collect().map(r => r.getAs[Number](0).longValue -> r.getDouble(1)).toMap
    assert(got.keySet == nodes.toSet)
    for (v <- nodes)
      assert(math.abs(got(v) - pr(v)) <= 1e-6,
        s"node $v: query ${got(v)} vs power iteration ${pr(v)}")
    // the teleport floor is a theorem, not a heuristic: every seed
    // keeps at least 0.15/|S| regardless of the graph; non-seeds have
    // no floor at all
    seeds.foreach(v => assert(got(v) >= 0.15 / seeds.size - 1e-9,
      s"seed $v rank ${got(v)} below its teleport floor"))
  }

  test("copurchaseEdgesByDst equals the symmetrized basketPairCounts view " +
    "and arrives clustered on dst") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val ed = graft.operators.GraphQueries.copurchaseEdgesByDst(spark, dir)
    // the partitioning CONTRACT: LPA/BFS rounds stream this frame
    // un-shuffled only because the cached plan reports hash clustering
    // on dst — a refactor that swaps persist for localCheckpoint
    // (which drops partitioning to UnknownPartitioning) must fail
    // here, not as a silent 2× perf regression. The observable
    // contract is the PLAN: a dst-keyed aggregation over ed must plan
    // with NO exchange.
    ed.count() // materialize the cache first
    val agg = ed.groupBy("dst").agg(count(lit(1)))
    agg.collect()
    // only the plan ABOVE the cache scan matters — the cached subtree
    // legitimately contains the edge build's own repartition exchange
    val above = agg.queryExecution.executedPlan.toString
      .split("InMemoryTableScan|TableCacheQueryStage")(0)
    assert(!above.contains("Exchange hashpartitioning"),
      s"dst-keyed agg over the edge list re-shuffled — clustering lost:\n$above")
    val (_, pairs) = graft.operators.StatsQueries.basketPairCounts(spark, dir)
    val sym = pairs
      .select(col("p1").as("src"), col("p2").as("dst"), col("n_both").as("w"))
      .unionByName(pairs
        .select(col("p2").as("src"), col("p1").as("dst"), col("n_both").as("w")))
    val edS = ed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val symS = sym.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(edS == symS,
      s"edge sets diverge: only-ed=${(edS -- symS).take(3)} only-sym=${(symS -- edS).take(3)}")
  }
}
