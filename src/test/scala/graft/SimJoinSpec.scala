package graft

import org.scalatest.funsuite.AnyFunSuite

/** J14 edit-distance similarity join + J16 SCD2 temporal join: pin the
  * engines against independent in-memory references, plus the
  * structural claims each exists for — J14: the candidate equi-join
  * must materialize strictly fewer pairs than all-pairs; J16: version
  * intervals must be disjoint, chained, band-alternating, and must
  * cover every fact exactly once. */
class SimJoinSpec extends AnyFunSuite {

  /** Textbook Wagner-Fischer, independent of Spark's levenshtein. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("J14: PassJoin-blocked pairs equal the all-pairs reference, " +
       "non-vacuously, and blocking actually prunes the pair space") {
    val s = TestSpark.spark
    val names = graft.core.Tables.part(s, TestSpark.Sf)
      .select("p_name").distinct().collect().map(_.getString(0)).sorted
    val ref = (for {
      i <- names.indices; j <- (i + 1) until names.length
      if math.abs(names(i).length - names(j).length) <= 2
      d = lev(names(i), names(j)) if d <= 2
    } yield (names(i), names(j), d)).toSeq
    assert(ref.nonEmpty, "no near-pairs in the catalog — test vacuous")
    val got = SparkEntry.queries("j14_editdist_join")(s, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSeq
    assert(got == ref.sortBy(p => (p._1, p._2)),
      s"engine ${got.take(5)} vs ref ${ref.take(5)}")
    // the pruning claim: candidate pairs surviving the segment
    // equi-join (pre-verify) < the C(n,2) all-pairs a naive join scans
    val allPairs = names.length.toLong * (names.length - 1) / 2
    // rebuild the candidate count with the verify filter dropped by
    // re-running the query minus its levenshtein stage is private;
    // instead bound it observably: every candidate pair shares a
    // segment, so pairs with NO common 2+-char substring never joined.
    // Count distinct (a,b) name pairs sharing any aligned segment key
    // via the reference construction of the index side.
    def segs(nm: String): Seq[(Int, Int, String)] = {
      val L = nm.length; val base = L / 3; val rem = L % 3
      (0 to 2).map { i =>
        val li = base + (if (i >= 3 - rem) 1 else 0)
        val pi = i * base + math.max(0, i - (3 - rem))
        (L, i, nm.substring(pi, pi + li))
      }
    }
    val bySeg = names.flatMap(n => segs(n).map(_ -> n))
      .groupBy(_._1).values
    val candUpper = bySeg.map { g => // pairs within one exact-key bucket
      val k = g.length.toLong; k * (k - 1) / 2
    }.sum
    assert(candUpper < allPairs,
      s"segment blocking holds no pruning power here ($candUpper vs " +
      s"$allPairs) — the test corpus no longer exercises it")
  }

  test("J16: SCD2 version intervals are disjoint, chained, and " +
       "band-alternating; every fact matches exactly one version; " +
       "the aggregate equals an in-memory temporal-join reference") {
    val s = TestSpark.spark
    import org.apache.spark.sql.functions.col
    // collect timestamps as ISO strings: type-agnostic (the testdata
    // stores dates as midnight timestamps) and lexicographic order ==
    // chronological order at a fixed format
    val vers = graft.queries.Joins.j16Versions(s, TestSpark.Sf)
      .select(col("ck"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("band"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), r.getString(3)))
    val byCk = vers.groupBy(_._1)
    // real SCD2 density: some customer must actually change bands
    assert(byCk.values.exists(_.length >= 2),
      "no customer has more than one version — SCD2 vacuous")
    byCk.foreach { case (ck, vs) =>
      val sorted = vs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // chained: valid_to of each version IS the next valid_from
          assert(a._3.contains(b._2),
            s"customer $ck: interval not chained at ${a._2}")
          // a version row exists only where the band CHANGED
          assert(a._4 != b._4,
            s"customer $ck: adjacent versions share band ${a._4}")
        case _ => ()
      }
      assert(sorted.last._3.isEmpty,
        s"customer $ck: last version is not open-ended")
    }
    // disjointness in effect: every lineitem fact lands in AT MOST one
    // version; facts shipping before the customer's first version start
    // (the testdata ships ~47% of lineitems before their order date)
    // legitimately match none and take the 'none' band
    val facts = graft.core.Tables.lineitem(s, TestSpark.Sf)
      .select("l_orderkey", "l_shipdate")
      .join(graft.core.Tables.orders(s, TestSpark.Sf)
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_shipdate").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    var inEffect = Map.empty[(String, Int), Long]
    facts.foreach { case (ck, sd) =>
      val hits = byCk.getOrElse(ck, Array.empty).filter { case (_, f, t, _) =>
        sd >= f && t.forall(sd < _)
      }
      assert(hits.length <= 1,
        s"fact ($ck, $sd) matched ${hits.length} versions — overlap")
      val key = (hits.headOption.map(_._4).getOrElse("none"),
        sd.substring(0, 4).toInt)
      inEffect = inEffect.updated(key, inEffect.getOrElse(key, 0L) + 1L)
    }
    val got = SparkEntry.queries("j16_scd2")(s, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // both join outcomes must be present — matched bands AND the
    // pre-first-version 'none' path
    assert(got.keySet.exists(_._1 == "none"),
      "no unmatched fact — the outer-join path is vacuous here")
    assert(got.keySet.exists(_._1 != "none"),
      "no matched fact — the temporal containment never fired")
    assert(got == inEffect,
      s"engine counts ${got.toSeq.sortBy(_._1).take(4)} vs " +
      s"reference ${inEffect.toSeq.sortBy(_._1).take(4)}")
  }

  test("J8b: forward as-of equals an in-memory per-customer scan, the " +
       "tolerance genuinely binds, and no order matches itself or a " +
       "past order") {
    val s = TestSpark.spark
    // o_orderdate surfaces as Timestamp or LocalDateTime depending on
    // the parquet physical type (NTZ) — normalize to epoch millis
    def ms(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime
      case l: java.time.LocalDateTime =>
        l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => fail(s"unexpected date type $other")
    }
    val orders = graft.core.Tables.orders(s, TestSpark.Sf)
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), ms(r.get(2))))
    val TolMs = 90L * 24 * 3600 * 1000
    val ref = orders.groupBy(_._1).values.flatMap { g =>
      g.map { case (_, k, d) =>
        val next = g.filter(o => o._3 > d && o._3 <= d + TolMs)
          .sortBy(o => (o._3, o._2)).headOption
        k -> next.map(o => (o._3, o._2))
      }
    }.toMap
    val got = SparkEntry.queries("j8b_asof_forward")(s, TestSpark.Sf)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some((ms(r.get(1)), r.getLong(2))))
      }.toMap
    assert(got == ref, "forward as-of diverges from the in-memory scan")
    val matched = got.count(_._2.isDefined)
    assert(matched > 0 && matched < got.size,
      s"degenerate coverage: $matched of ${got.size}")
    // the tolerance binds: some customer HAS a later order, just not
    // within 90 days — without the tolerance, that row would match
    val hasLaterAnyHorizon = orders.groupBy(_._1).values.flatMap { g =>
      g.map { case (_, k, d) => k -> g.exists(_._3 > d) }
    }.toMap
    assert(got.exists { case (k, v) => v.isEmpty && hasLaterAnyHorizon(k) },
      "tolerance never binds — every later order is within 90 days, " +
      "the tolerance clause is untested")
    // direction: every match is strictly in the future of its left row
    val dateOf = orders.map(o => o._2 -> o._3).toMap
    got.foreach { case (k, v) => v.foreach { case (nd, nk) =>
      assert(nk != k, s"order $k matched itself")
      assert(nd > dateOf(k), s"order $k matched a non-future order $nk")
    } }
  }
}
