package graft

import org.scalatest.funsuite.AnyFunSuite

/** L45 BM25 retrieval + G1 PageRank: pin the distributed engines
  * against independent in-memory references on the same exact-integer
  * arithmetic, plus the ordering/mass contracts a wrong shuffle or a
  * lost message round would break. */
class RetrievalGraphSpec extends AnyFunSuite {

  test("L45: BM25 top-5 equals an in-memory exact-integer reference") {
    val s = TestSpark.spark
    val texts = graft.core.Tables.documents(s, TestSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val tf: Map[(Long, String), Long] = texts.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, o) => (id, t) -> o.length.toLong }
    }.toMap
    val dl: Map[Long, Long] = texts.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val df: Map[String, Long] = tf.keys.toSeq.groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val totdl = dl.values.sum
    val nd = dl.size.toLong
    val ref = texts.filter(_._1 % 17 == 0).flatMap { case (qid, ts) =>
      val terms = ts.take(4).toSet
      val scores = texts.map(_._1).flatMap { did =>
        val sc = terms.toSeq.flatMap { t =>
          tf.get((did, t)).map { f =>
            val idfFp = (2L * nd - 2L * df(t) + 1L) *
              graft.llm.Retrieval.Scale / (2L * df(t) + 1L)
            val tfpFp = (f * 22000L * totdl) /
              (10L * totdl * f + 3L * totdl + 9L * dl(did) * nd)
            idfFp * tfpFp
          }
        }.sum
        if (sc > 0 || terms.exists(t => tf.contains((did, t))))
          Some(did -> sc) else None
      }
      scores.sortBy { case (did, sc) => (-sc, did) }.take(5).zipWithIndex
        .map { case ((did, sc), i) => (qid, i + 1, did, sc) }
    }.sortBy(r => (r._1, r._2))
    val out = SparkEntry.queries("l45_bm25_topk")(s, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == ref.toSeq, s"engine ${out.take(3)}… vs ref ${ref.take(3)}…")
    assert(out.nonEmpty && out.forall(_._4 > 0), "vacuous: no positive scores")
    // rank contract: contiguous 1..k per query, k ≤ 5. (Self-retrieval
    // is deliberately NOT asserted: on this synthetic shared-vocabulary
    // corpus tf saturation legitimately lets a shorter doc outrank the
    // query's own source — the reference equality above already pins
    // the full ranking.)
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted == (1 to rows.length), s"ranks not contiguous for $qid")
    }
  }

  test("L48: RRF fuses the two rankers rather than copying one — " +
       "cross-ranker consensus docs exist and outrank single-ranker " +
       "docs, the fused head diverges from BM25's somewhere, and the " +
       "k=60 damping makes (2,2) consensus beat a lone rank-1") {
    val s = TestSpark.spark
    // the damping property RRF is chosen for, on the exact formula
    assert(2 * (1000000L / 62) > 1000000L / 61,
      "k=60 damping broken: a (2,2) consensus must beat (1, absent)")
    val fused = SparkEntry.queries("l48_rrf_fusion")(s, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(fused.nonEmpty, "no fused rows")
    // every rrf must be a sum of 0/1/2 legal per-ranker contributions,
    // and contributions from BOTH rankers are distinguishable: the
    // single-ranker value set and the consensus (two-term) value set
    // are disjoint for ranks 1..10
    val single = (1 to 10).map(r => 1000000L / (60 + r)).toSet
    val consensus = (for (a <- single; b <- single) yield a + b).toSet
    assert((single & consensus).isEmpty, "value sets collide — probe broken")
    assert(fused.forall(r => single(r._4) || consensus(r._4)),
      "an rrf value matches neither one- nor two-ranker composition")
    assert(fused.exists(r => consensus(r._4)),
      "no cross-ranker consensus doc in any top-5 — fusion vacuous")
    // somewhere a consensus doc outranks a single-ranker doc — the
    // behavior fusion exists to produce
    val perQ = fused.groupBy(_._1)
    assert(perQ.exists { case (_, rows) =>
      rows.sortBy(_._2).toSeq.sliding(2).exists {
        case Seq(hi, lo) => consensus(hi._4) && single(lo._4)
        case _ => false
      }
    }, "no consensus-above-single ordering anywhere — fusion inert")
    // and the fused head is not just BM25's head for every query
    val bm25Top1 = SparkEntry.queries("l45_bm25_topk")(s, TestSpark.Sf)
      .collect().filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fusedTop1 = fused.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    assert(fusedTop1.exists { case (q, d) =>
      bm25Top1.get(q).exists(_ != d) },
      "fused top-1 equals BM25 top-1 for every query — dense side inert")
  }

  test("G1: PageRank top-20 equals an in-memory exact-integer Pregel " +
       "reference, and total mass never exceeds Scale") {
    val s = TestSpark.spark
    import graft.queries.Graph.{Rounds, Scale}
    val pairs = graft.core.Tables.orders(s, TestSpark.Sf)
      .select("o_orderkey", "o_custkey")
      .join(graft.core.Tables.lineitem(s, TestSpark.Sf)
        .select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val edges = pairs.flatMap { case (c, p) => Seq(c -> p, p -> c) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nv = deg.size.toLong
    val tele = 15L * Scale / (100L * nv)
    var pr: Map[Long, Long] = deg.keys.map(_ -> Scale / nv).toMap
    for (_ <- 1 to Rounds) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => pr(src) / deg(src) }.sum).toMap
      pr = in.map { case (v, sm) => v -> (tele + 85L * sm / 100L) }
    }
    val refTop = pr.toSeq.sortBy { case (nid, p) => (-p, nid) }.take(20)
    val out = SparkEntry.queries("g1_pagerank")(s, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq.map(r => (r._1, r._4)) == refTop,
      s"engine ${out.take(3).toSeq} vs ref ${refTop.take(3)}")
    // node decode contract
    out.foreach { case (nid, kind, key, _) =>
      assert(kind == (if (nid % 2 == 0) "customer" else "supplier"))
      assert(key == nid / 2)
    }
    // floor division only ever LOSES mass: Σ pr ≤ Scale, and stays
    // within 1% of it (nothing structural drained — no dangling nodes)
    val mass = pr.values.sum
    assert(mass <= Scale, s"mass $mass exceeds scale")
    assert(mass > Scale - Scale / 100, s"mass $mass drained > 1%")
  }

  test("G1b: convergence-mode PageRank equals an in-memory reference, " +
       "converges before the cap, and the dangling term is positively " +
       "exercised") {
    val s = TestSpark.spark
    import graft.queries.Graph.{ConvCap, Scale}
    val pairs = graft.core.Tables.orders(s, TestSpark.Sf)
      .select("o_orderkey", "o_custkey")
      .join(graft.core.Tables.lineitem(s, TestSpark.Sf)
        .select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1)) // DIRECTED c→s
    val deg = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    val nv = nodes.length.toLong
    val tele = Scale / (2L * nv)
    var pr: Map[Long, Long] = nodes.map(_ -> Scale / nv).toMap
    var refRounds = 0
    var stationary = false
    while (refRounds < ConvCap && !stationary) {
      val dangShare =
        nodes.filter(n => !deg.contains(n)).map(pr).sum / nv
      val in = pairs.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => pr(src) / deg(src) }.sum).toMap
      val next = nodes.map(n =>
        n -> (tele + (in.getOrElse(n, 0L) + dangShare) / 2L)).toMap
      stationary = next == pr
      pr = next
      refRounds += 1
    }
    // the convergence stop must actually FIRE at the test scale — a
    // capped run would leave the stationarity machinery undemonstrated
    assert(refRounds < ConvCap, s"reference hit the cap ($refRounds)")
    // the dangling term must be positive — every supplier dangles in
    // the directed co-purchase graph, by construction
    val dangMass = nodes.filter(n => !deg.contains(n)).map(pr).sum
    assert(dangMass > 0, "no dangling mass — the redistribution term is vacuous")
    val (out, engRounds) = graft.queries.Graph.g1bRun(s, TestSpark.Sf)
    assert(engRounds == refRounds,
      s"engine rounds $engRounds vs reference $refRounds")
    val refTop = pr.toSeq.sortBy { case (nid, p) => (-p, nid) }.take(20)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq.map(r => (r._1, r._4)) == refTop,
      s"engine ${got.take(3).toSeq} vs ref ${refTop.take(3)}")
  }

  test("G2: per-node triangle counts equal an in-memory brute force, " +
       "and the graph actually has triangles") {
    val s = TestSpark.spark
    // brute force: undirected co-order part edges, count triangles per
    // node by iterating neighbor pairs (no orientation — independent of
    // the engine's degree-ordered algorithm)
    val li = graft.core.Tables.lineitem(s, TestSpark.Sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triPerNode = scala.collection.mutable.Map[Long, Long]()
    edges.foreach { case (a, b) =>
      (adj(a) & adj(b)).foreach { c =>
        // count each triangle once per corner via its a<b edge + common
        // neighbor c>b (so {a,b,c} with a<b<c is seen exactly once)
        if (c > b) Seq(a, b, c).foreach(n =>
          triPerNode(n) = triPerNode.getOrElse(n, 0L) + 1L)
      }
    }
    assert(triPerNode.values.sum > 0, "no triangles — test vacuous")
    val refTop = triPerNode.toSeq.sortBy { case (n, c) => (-c, n) }.take(20)
    val got = SparkEntry.queries("g2_triangles")(s, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == refTop, s"engine ${got.take(5)} vs ref ${refTop.take(5)}")
  }

  test("G3: label-propagation communities equal an in-memory " +
       "synchronous-LPA reference, and propagation actually merges") {
    val s = TestSpark.spark
    val li = graft.core.Tables.lineitem(s, TestSpark.Sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val und = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to graft.queries.Graph.LpaRounds) {
      lbl = adj.map { case (v, ns) =>
        val cnt = ns.groupBy(lbl).view.mapValues(_.length).toSeq
        v -> cnt.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val ref = lbl.values.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .sortBy { case (l, n) => (-n, l) }
    assert(ref.size < lbl.size,
      "every node kept its own label — propagation vacuous")
    val got = SparkEntry.queries("g3_labelprop")(s, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == ref, s"engine ${got.take(5)} vs ref ${ref.take(5)}")
  }

  test("G4: multi-source BFS hop distances equal an in-memory " +
       "reference, stop before the cap, and reach past one hop") {
    val s = TestSpark.spark
    import graft.queries.Graph.{BfsCap, BfsSrcMod}
    val li = graft.core.Tables.lineitem(s, TestSpark.Sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    // support-2 co-order edges: pair instances per order, kept iff the
    // pair occurs in >= 2 distinct orders (the engine's supportEdges)
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity)
      // NB: .filter + .keys, NOT .collect { case (e, occ) => e } — on a
      // Map, collect-to-tuples rebuilds a MAP and silently collapses
      // the edge pairs by first element
      .filter(_._2.size >= 2).keys.toSeq
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val src = adj.keys.filter(_ % BfsSrcMod == 0).toSeq
    assert(src.nonEmpty, "empty source set — BFS vacuous")
    var dist: Map[Long, Int] = src.map(_ -> 0).toMap
    var frontier = src
    var refRounds = 0
    while (frontier.nonEmpty && refRounds < BfsCap) {
      val next = frontier.flatMap(adj(_)).distinct
        .filterNot(dist.contains)
      if (next.nonEmpty) {
        refRounds += 1
        dist ++= next.map(_ -> refRounds)
      }
      frontier = next
    }
    // the empty-frontier stop must actually fire at test scale
    assert(refRounds < BfsCap, s"reference hit the cap ($refRounds)")
    assert(dist.values.max >= 2, "BFS never reached past one hop — vacuous")
    val (out, engRounds) = graft.queries.Graph.g4Run(s, TestSpark.Sf)
    assert(engRounds == refRounds,
      s"engine rounds $engRounds vs reference $refRounds")
    val got = out.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val ref = dist.toSeq.sortBy(r => (r._2, r._1))
    assert(got == ref, s"engine ${got.take(5)} vs ref ${ref.take(5)}")
  }

  test("G5: weighted SSSP distances equal an in-memory Dijkstra, stop " +
       "before the cap, and the weights genuinely bend some path") {
    val s = TestSpark.spark
    import graft.queries.Graph.{BfsSrcMod, SsspCap}
    val li = graft.core.Tables.lineitem(s, TestSpark.Sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    // weighted support-2 edges: support >= 4 -> w 1, 3 -> 2, 2 -> 3
    val wedges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2)
      .map { case ((a, b), occ) =>
        (a, b, if (occ.size >= 4) 1L else if (occ.size == 3) 2L else 3L)
      }.toSeq
    assert(wedges.map(_._3).distinct.length >= 2,
      "all edges share one weight — weighted SSSP degenerates to BFS")
    val adj = wedges.flatMap { case (a, b, w) => Seq(a -> (b, w), b -> (a, w)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val src = adj.keys.filter(_ % BfsSrcMod == 0).toSeq
    assert(src.nonEmpty, "empty source set — SSSP vacuous")
    // multi-source Dijkstra
    val dist = scala.collection.mutable.Map[Long, Long]()
    val pq = scala.collection.mutable.PriorityQueue[(Long, Long)]()(
      Ordering.by(-_._1))
    src.foreach { n => dist(n) = 0L; pq.enqueue((0L, n)) }
    while (pq.nonEmpty) {
      val (d0, n) = pq.dequeue()
      if (dist(n) == d0)
        adj(n).foreach { case (m, w) =>
          if (!dist.contains(m) || d0 + w < dist(m)) {
            dist(m) = d0 + w; pq.enqueue((d0 + w, m))
          }
        }
    }
    val ref = dist.toSeq.sortBy(r => (r._2, r._1))
      .map { case (n, d) => (n, d.toInt) }
    // non-vacuity: some optimal distance uses a non-3 weight, and the
    // walk reaches beyond a single heaviest edge
    assert(ref.exists(r => r._2 > 0 && r._2 % 3 != 0),
      "every distance is a multiple of 3 — weights never mattered")
    assert(ref.map(_._2).max > 3, "SSSP never reached past one edge")
    val (out, engRounds) = graft.queries.Graph.g5Run(s, TestSpark.Sf)
    assert(engRounds < SsspCap, s"engine hit the cap ($engRounds)")
    val got = out.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == ref, s"engine ${got.take(5)} vs ref ${ref.take(5)}")
  }
}
