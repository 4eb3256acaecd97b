package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Cluster

/** L22 properties a hash-match alone cannot express: convergence on
  * adversarial graph shapes (the pointer-jumping claim), and the
  * component invariants (edge-closure, canonical-election) on the real
  * corpus. */
class ClusterSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  test("L22: a 64-node path graph collapses to one component " +
       "(pointer jumping, not O(diameter) propagation)") {
    // worst case for plain label propagation: one long chain. maxIter=12
    // would fail at O(diameter)=63 rounds but passes with the jump step
    // (observed: 7 rounds — ~log2(63) neighbour+jump rounds + 1 to
    // detect the fixpoint).
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("d1", "d2")
    val nodes = (0L to 63L).toDF("node")
    val labels = Cluster.connectedComponents(nodes, edges, maxIter = 12)
    assert(labels.select(countDistinct(col("label"))).as[Long].head() === 1L)
    assert(labels.filter(col("label") =!= 0L).count() === 0L)
  }

  test("L22: a 1000-spoke star (max-skew hub) collapses in the " +
       "contraction pass, not the loop") {
    // dup graphs concentrate edges on clique/hub nodes; the phase-1
    // groupBy absorbs the hub's degree as an aggregation (map-side
    // partial, skew-safe), leaving the loop an EMPTY contracted graph
    // that converges in its single allowed round — maxIter=1 fails for
    // any implementation that still iterates over the raw star (the
    // loop would need round 1 to relabel + round 2 to observe the
    // fixpoint)
    val edges = (1L to 1000L).map(i => (0L, i)).toDF("d1", "d2")
    val nodes = (0L to 1000L).toDF("node")
    val labels = Cluster.connectedComponents(nodes, edges, maxIter = 1)
    assert(labels.filter(col("label") =!= 0L).count() === 0L)
  }

  test("L22: disjoint chains + isolated nodes label independently") {
    // two 3-chains that must NOT merge, plus two isolated nodes
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 22L), (22L, 21L))
      .toDF("d1", "d2")
    val nodes = Seq(10L, 11L, 12L, 20L, 21L, 22L, 30L, 31L).toDF("node")
    val got = Cluster.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
                       20L -> 20L, 21L -> 20L, 22L -> 20L,
                       30L -> 30L, 31L -> 31L))
  }

  test("L22 canonical: components are edge-closed and csize-consistent " +
       "at sf0.001") {
    val res = SparkEntry.queries("l22_dup_clusters")(s, TestSpark.Sf)
      .select(col("doc_id"), col("component"), col("csize"),
              col("is_canonical")).cache()
    try {
      // every near-dup edge has both endpoints in the same component
      val lab = res.select(col("doc_id"), col("component"))
      val edges = graft.llm.DedupExt.nearDupPairs(s, TestSpark.Sf)
      val crossEdges = edges
        .join(lab.select(col("doc_id").as("d1"), col("component").as("c1")), "d1")
        .join(lab.select(col("doc_id").as("d2"), col("component").as("c2")), "d2")
        .filter(col("c1") =!= col("c2")).count()
      assert(crossEdges === 0L, "an edge crosses two components")
      // csizes partition the corpus; exactly one canonical per component
      val n = res.count()
      val bySize = res.select(col("component"), col("csize")).distinct()
        .agg(sum(col("csize"))).as[Long].head()
      assert(bySize === n, "csizes do not partition the doc set")
      val canPerComp = res.groupBy(col("component"))
        .agg(sum(when(col("is_canonical"), 1L).otherwise(0L)).as("nc"))
        .filter(col("nc") =!= 1L).count()
      assert(canPerComp === 0L, "component without exactly one canonical")
      // the canonical doc is the component min (= the component id)
      assert(res.filter(col("is_canonical") && col("doc_id") =!= col("component"))
        .count() === 0L)
    } finally res.unpersist()
  }

  test("L22: clustering strictly tightens pairwise dedup when chains " +
       "exist (multi-hop components at sf0.01)") {
    // at sf0.01 the pair graph genuinely chains (components larger than
    // any clique of pairwise survivors); keep-set size must be ≤ the
    // pairwise survivor count, with at least one component of size ≥ 3
    val sf = "/root/testdata/sf0.01"
    val res = SparkEntry.queries("l22_dup_clusters")(s, sf)
    assert(res.filter(col("csize") >= 3).count() > 0L,
      "no multi-hop components — CC adds nothing over pair-dedup here")
  }

  test("L39: the export manifest is consistent with its four stages") {
    // cross-stage invariants the hash-match cannot localize: the
    // manifest must account for EXACTLY the l36-elected reps, split
    // them exactly as l37 splits their components, and carry the l33
    // effective-token mass of exactly those reps.
    val man = SparkEntry.queries("l39_corpus_export")(s, TestSpark.Sf)
      .cache()
    val reps = SparkEntry.queries("l36_cluster_rep")(s, TestSpark.Sf)
      .select(col("rep_doc").as("doc_id"), col("component")).cache()
    try {
      // (1) doc accounting: manifest docs == elected reps, and Σdoc_id
      // matches — nothing dropped, nothing invented, no doc twice
      val nMan = man.agg(sum(col("n_docs"))).as[Long].head()
      val nReps = reps.count()
      assert(nMan === nReps, s"manifest holds $nMan docs, election kept $nReps")
      assert(man.agg(sum(col("sum_doc"))).as[Long].head() ===
        reps.agg(sum(col("doc_id"))).as[Long].head())
      // (2) split sides follow the l37 component hash of the rep's
      // component: per-side doc counts must match the l37 assignment
      // restricted to reps
      val l37 = SparkEntry.queries("l37_leakfree_split")(s, TestSpark.Sf)
      val expSides = l37.join(reps.select(col("doc_id")), "doc_id")
        .groupBy(col("split")).count()
        .as[(String, Long)].collect().toMap
      val gotSides = man.groupBy(col("split")).agg(sum(col("n_docs")))
        .as[(String, Long)].collect().toMap
      assert(gotSides === expSides, s"split sides $gotSides != $expSides")
      // (3) token mass: Σ eff_tok over the manifest == Σ (n_tok −
      // n_removed_tok) over exactly the rep docs (the l33 stage)
      val l33 = SparkEntry.queries("l33_span_dedup")(s, TestSpark.Sf)
      val expTok = l33.join(reps.select(col("doc_id")), "doc_id")
        .agg(sum(col("n_tok") - col("n_removed_tok"))).as[Long].head()
      assert(man.agg(sum(col("sum_eff_tok"))).as[Long].head() === expTok)
      // (4) shard plan shape: per split, shards are contiguous from 0
      // and sized ≤ ceil(n/16)
      man.select(col("split"), col("shard"), col("n_docs"))
        .as[(String, Long, Long)].collect().groupBy(_._1)
        .foreach { case (side, rows) =>
          val shards = rows.map(_._2).sorted
          assert(shards === (0L until shards.length).toArray.toSeq,
            s"$side shards not contiguous: ${shards.mkString(",")}")
          val n = rows.map(_._3).sum
          val cap = (n + 15L) / 16L
          assert(rows.forall(_._3 <= cap),
            s"$side has a shard above the ceil(n/16)=$cap cap")
        }
    } finally { man.unpersist(); reps.unpersist() }
  }
}
