package graft

import org.scalatest.funsuite.AnyFunSuite

/** L8e image near-dup pins: the banded-hamming pairing over blockhash
  * bands has GUARANTEED recall at radius ≤ bands − 1 (pigeonhole), so
  * every derived variant pair must appear; plus output hygiene
  * (radius bound, canonical pair order, determinism). The kernel ≡
  * oracle equivalence itself is driver-gated (hash check at both sfs).
  */
class MultimodalSpec extends AnyFunSuite {
  private val Off = 1000000L

  private lazy val rows =
    SparkEntry.queries("l8e_image_neardup")(TestSpark.spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("L8e: every derived variant pair is found (pigeonhole recall " +
       "guarantee at radius 3 with 4 bands)") {
    val docIds = graft.core.Tables.documents(TestSpark.spark, TestSpark.Sf)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = docIds.filter(_ % 5 == 0).map(d => (d, d + Off)).toSet
    assert(expected.nonEmpty, "no variant images — test vacuous")
    val got = rows.map(t => (t._1, t._2)).toSet
    val missing = expected -- got
    assert(missing.isEmpty,
      s"${missing.size} variant pairs missed (first: ${missing.take(3)}) — " +
      "a one-byte perturbation must stay inside the hamming radius and " +
      "band blocking is exact at radius ≤ 3")
  }

  test("L8e: pairs are canonical (va < vb), within radius, and at " +
       "least one exact-duplicate pair scores hamming 0") {
    rows.foreach { case (va, vb, h) =>
      assert(va < vb, s"non-canonical pair ($va, $vb)")
      assert(h >= 0 && h <= 3, s"pair ($va, $vb) hamming $h outside radius")
    }
    assert(rows.exists(_._3 == 0L),
      "no hamming-0 pair — exact dups and unperturbed-block variants " +
      "should collide exactly")
  }

  test("L8e: output is deterministic across runs") {
    val again =
      SparkEntry.queries("l8e_image_neardup")(TestSpark.spark, TestSpark.Sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rows.toSeq)
  }

  private lazy val dedup =
    SparkEntry.queries("l8f_image_dedup")(TestSpark.spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("L8f: every image gets exactly one assignment; keeper is a kept " +
       "member of its own cluster and never exceeds the image id") {
    val nImgs = {
      val nDocs = graft.core.Tables
        .documents(TestSpark.spark, TestSpark.Sf).count()
      val nVar = graft.core.Tables.documents(TestSpark.spark, TestSpark.Sf)
        .filter("doc_id % 5 = 0").count()
      nDocs + nVar
    }
    assert(dedup.length.toLong == nImgs, "one output row per image")
    assert(dedup.map(_._1).distinct.length == dedup.length,
      "img_id is unique")
    val keptFlags = dedup.map(t => t._1 -> t._3).toMap
    dedup.foreach { case (img, keeper, kept) =>
      assert(keeper <= img, s"keeper $keeper exceeds member $img")
      assert(kept == (if (img == keeper) 1L else 0L),
        s"kept flag wrong for ($img, $keeper)")
      assert(keptFlags(keeper) == 1L,
        s"keeper $keeper of $img is not itself kept")
    }
    val nKept = dedup.count(_._3 == 1L)
    assert(dedup.map(_._2).distinct.length == nKept,
      "distinct keepers == kept rows")
    assert(nKept < dedup.length,
      "collapse is non-trivial — some cluster has > 1 member " +
      "(exact dups / unperturbed-block variants exist at every sf)")
  }

  test("L8f composes with L8e: a hamming-0 near-dup pair always shares " +
       "a keeper (identical hashes are one cluster)") {
    val keeperOf = dedup.map(t => t._1 -> t._2).toMap
    val zeroPairs = rows.filter(_._3 == 0L)
    assert(zeroPairs.nonEmpty, "no hamming-0 pair — cross-pin vacuous")
    zeroPairs.foreach { case (va, vb, _) =>
      assert(keeperOf(va) == keeperOf(vb),
        s"hamming-0 pair ($va, $vb) split across clusters " +
        s"(${keeperOf(va)} vs ${keeperOf(vb)})")
    }
  }
}
