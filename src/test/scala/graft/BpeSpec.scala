package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.Bpe

/** L40 BPE-trainer properties a hash-match alone cannot express:
  * determinism of the distributed trainer against an independent
  * in-memory reference implementation (same declared semantics, plain
  * Scala collections — no Spark), and the greedy-fold re-segmentation
  * rule on its edge cases. */
class BpeSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  /** Reference greedy left-to-right single-merge pass. */
  private def refMerge(syms: List[String], x: String, y: String): List[String] =
    syms.foldLeft(List.empty[String]) { (acc, sym) =>
      if (acc.nonEmpty && acc.last == x && sym == y)
        acc.init :+ (x + y)
      else acc :+ sym
    }

  /** Reference trainer over an in-memory word-freq table (the same
    * declared semantics as Bpe.train: argmax by (cnt DESC, x, y),
    * stop below MinPair, Merges rounds). */
  private def refTrain(wf: Seq[(String, Long)])
      : Seq[(Int, String, String, Long)] = {
    var seg = wf.map { case (w, f) => (f, w.map(_.toString).toList) }
    val out = scala.collection.mutable.ListBuffer[(Int, String, String, Long)]()
    var t = 1
    var done = false
    while (t <= Bpe.Merges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      seg.foreach { case (f, sy) =>
        sy.zip(sy.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val qual = counts.filter(_._2 >= Bpe.MinPair)
      if (qual.isEmpty) done = true
      else {
        val ((x, y), c) = qual.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((t, x, y, c))
        seg = seg.map { case (f, sy) => (f, refMerge(sy, x, y)) }
        t += 1
      }
    }
    out.toSeq
  }

  test("l40 trained merges equal the in-memory reference trainer") {
    val wordFreq = s.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, f) => (-f, w) }
      .take(Bpe.VocabCap).toSeq
    val expected = refTrain(wordFreq)
    val got = Bpe.train(s, TestSpark.Sf).merges
    assert(got == expected)
    assert(got.nonEmpty, "trainer learned zero merges — the pin is vacuous")
  }

  test("greedy fold handles overlapping pairs non-overlappingly") {
    import s.implicits._
    // "aaa" + (a,a) → [aa, a]; "abab" + (a,b) → [ab, ab]; empty stays
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b"),
                 Seq.empty[String])
      .toDF("syms")
    val aa = df.select(Bpe.mergeCol(col("syms"), "a", "a"))
      .collect().map(_.getSeq[String](0).toList)
    assert(aa(0) == List("aa", "a"))
    assert(aa(2) == Nil)
    val ab = df.select(Bpe.mergeCol(col("syms"), "a", "b"))
      .collect().map(_.getSeq[String](0).toList)
    assert(ab(1) == List("ab", "ab"))
  }

  test("mergeSeq (driver fold) ≡ mergeCol (Catalyst fold) on edge cases") {
    import s.implicits._
    // the r21 driver-side trainer replays mergeCol's semantics via
    // mergeSeq — this pins the two against each other DIRECTLY (the
    // claim in mergeSeq's doc), over the overlap/empty/no-match edges
    // plus multi-char merged symbols
    val cases = Seq(
      Seq("a", "a", "a"), Seq("a", "b", "a", "b"), Seq.empty[String],
      Seq("a", "a", "a", "a"), Seq("b", "a", "b"), Seq("x"),
      Seq("ab", "c", "ab", "c"), Seq("a", "b", "b", "a", "b"))
    val pairs = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("ab", "c"))
    pairs.foreach { case (x, y) =>
      val viaCol = cases.toDF("syms")
        .select(Bpe.mergeCol(col("syms"), x, y))
        .collect().map(_.getSeq[String](0).toIndexedSeq).toSeq
      val viaSeq = cases.map(c => Bpe.mergeSeq(c.toIndexedSeq, x, y))
      assert(viaCol == viaSeq, s"mergeCol vs mergeSeq diverged on ($x,$y)")
    }
  }

  test("pairCounts (distributed 2-phase) matches the in-memory pair count") {
    import s.implicits._
    val segs = Seq((3L, Seq("a", "b", "a")), (2L, Seq("b", "a")),
      (5L, Seq("x")), (1L, Seq.empty[String]))
    val df = segs.toDF("freq", "syms")
    val got = Bpe.pairCounts(df).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val expected = segs.flatMap { case (f, sy) =>
      sy.zip(sy.drop(1)).map(p => (p, f))
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(got == expected)
  }

  test("encode counts: trained words use |syms|, OOV falls back to chars") {
    val m = Bpe.train(s, TestSpark.Sf)
    val segMap = m.seg.map { case (w, _, sy) => w -> sy.length }.toMap
    val enc = SparkEntry.queries("l40b_bpe_encode")(s, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = s.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      (id, ws.length.toLong,
        ws.map(w => segMap.getOrElse(w, w.length).toLong).sum)
    }.sortBy(_._1)
    assert(enc.sortBy(_._1).toSeq == expected.toSeq)
  }
}
