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
}
