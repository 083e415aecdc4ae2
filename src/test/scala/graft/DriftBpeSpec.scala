package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{Corpus, TextOps}

/** PSI source drift + BPE pair-count goldens. */
class DriftBpeSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (i, t, src) => (i, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("sourceDrift: identical sources score identically, a shifted one scores higher") {
    val four = "a b c d"
    val thirtyTwo = (1 to 32).map(_ => "w").mkString(" ")
    val d = docs(
      (0 until 10).map(i => (i.toLong, four, "srcA")) ++
        (10 until 20).map(i => (i.toLong, four, "srcB")) ++
        (20 until 30).map(i => (i.toLong, thirtyTwo, "srcC")): _*)
    val r = Corpus.sourceDrift(d).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("psi")).toMap
    assert(r("srcA") == r("srcB"))
    assert(r("srcC") > r("srcA"))
    assert(r("srcC") > 1.0, s"shifted source PSI ${r("srcC")} should be large")
  }

  test("bpePairCounts weights pairs by word frequency over the distinct vocab") {
    val d = docs(
      (0L, "ab ab cd abc", "s"),
      (1L, "ab x", "s")) // single-char word 'x' contributes no pair
    val r = TextOps.bpePairCounts(d, 10).collect()
      .map(x => x.getString(0) -> x.getLong(1))
    // vocab: ab(cnt 3), cd(1), abc(1) → ab: 3+1=4, bc: 1, cd: 1
    assert(r.toSeq == Seq("ab" -> 4L, "bc" -> 1L, "cd" -> 1L))
  }

  test("bpeTrainMerges: greedy run merge, compound second merge, exhaustion stop") {
    // 'aaa' ×10: round 1 counts (a,a) twice per word (n=20) and merges
    // runs left-to-right: [a,a,a] → [aa,a]. Round 2 must see the MERGED
    // symbol and learn (aa,a) n=10. Round 3 finds no pairs → stops
    // early despite iters=5.
    val d = docs((0L to 9L).map(i => (i, "aaa", "s")): _*)
    val r = TextOps.bpeTrainMerges(d, 5).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1, "a", "a", "aa", 20L),
      (2, "aa", "a", "aaa", 10L)))
  }

  test("bpeTrainMergesBatched: rank-window conflict rule — a candidate " +
      "sharing a symbol with a higher-ranked one is dropped, disjoint " +
      "ones merge together; counts recount at round cadence") {
    // vocab: abc ×20, ab ×10, de ×10 → round-1 counts (a,b)=30,
    // (b,c)=20, (d,e)=10. Window of 3: rank-1 (a,b) selected; rank-2
    // (b,c) shares 'b' with rank-1 → dropped; rank-3 (d,e) is disjoint
    // from BOTH higher-ranked candidates → selected alongside.
    // Round 2 recounts over the merged state ([ab,c] ×20) and learns
    // (ab, c) = 20 — the merged symbol visible only because the round
    // boundary recounted.
    val d = docs(
      (0L until 20L).map(i => (i, "abc", "s")) ++
        (20L until 30L).map(i => (i, "ab", "s")) ++
        (30L until 40L).map(i => (i, "de", "s")): _*)
    val r = TextOps.bpeTrainMergesBatched(d, rounds = 2, batchSize = 3)
      .collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getInt(2), x.getString(3),
        x.getString(4), x.getString(5), x.getLong(6)))
    assert(r.toSeq == Seq(
      (1, 1, 1, "a", "b", "ab", 30L),
      (2, 1, 3, "d", "e", "de", 10L),
      (3, 2, 1, "ab", "c", "abc", 20L)))
  }

  test("bpeTrainMergesBatched at batchSize=1 reproduces the serial " +
      "trainer's merge sequence exactly") {
    val d = docs((0L until 10L).map(i => (i, "aaa", "s")) ++
      (10L until 15L).map(i => (i, "bc", "s")): _*)
    val serial = TextOps.bpeTrainMerges(d, 3).collect()
      .map(x => (x.getString(1), x.getString(2), x.getLong(4))).toSeq
    val batched = TextOps.bpeTrainMergesBatched(d, rounds = 3, batchSize = 1)
      .collect()
      .map(x => (x.getString(3), x.getString(4), x.getLong(6))).toSeq
    assert(batched == serial,
      s"batchSize=1 must degenerate to serial: $batched vs $serial")
  }

  test("bpeEncode: learned merges compress each doc; counts are exact") {
    // vocab {aaa, bc}: merges (a,a)→aa then (aa,a)→aaa (n=20,10) use up
    // rounds 1-2; rounds 3+ merge (b,c) n=5. 'aaa' → 1 token,
    // 'bc' → 1 token.
    val d = docs((0L until 10L).map(i => (i, "aaa bc", "s")) :+
      ((10L, "aaa", "s")): _*)
    val r = TextOps.bpeEncode(d, 5).collect()
    assert(r.length == 11)
    val d0 = r.find(_.getLong(0) == 0L).get
    assert(d0.getAs[Long]("n_words") == 2L)
    assert(d0.getAs[Long]("n_char_tokens") == 5L)
    assert(d0.getAs[Long]("n_bpe_tokens") == 2L)
    assert(d0.getAs[Double]("compression") == 2.5)
    val d10 = r.find(_.getLong(0) == 10L).get
    assert(d10.getAs[Long]("n_bpe_tokens") == 1L)
    assert(d10.getAs[Double]("compression") == 3.0)
  }

  test("bpeFertilityByLang: under-represented language pays more tokens per word") {
    val spark2 = spark
    import spark2.implicits._
    // en dominates training: merges build 'aaa' and 'bc' fully (1 token
    // each); the lone de word 'qrstu' only gets the leftover rounds
    // ((q,r) then (qr,s)) → 3 tokens → fertility 3 vs en's 1.
    val d = ((0L until 10L).map(i => (i, "aaa bc", "en", "s", 6L)) :+
        ((10L, "qrstu", "de", "s", 5L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextOps.bpeFertilityByLang(d, 5).collect()
      .map(x => x.getAs[String]("lang") ->
        (x.getAs[Long]("n_words"), x.getAs[Double]("fertility"),
          x.getAs[Double]("char_compression"))).toMap
    assert(r("en") == ((20L, 1.0, 2.5)))
    assert(r("de") == ((1L, 3.0, 1.6667)))
  }

  test("bpeTrainMerges: count ties break lexicographically on (left, right)") {
    // xy and xz both n=5 → (x,y) must win round 1
    val d = docs((0L, Seq.fill(5)("xy").mkString(" ") + " " +
      Seq.fill(5)("xz").mkString(" "), "s"))
    val r = TextOps.bpeTrainMerges(d, 1).collect()
    assert(r.length == 1)
    assert(r(0).getString(1) == "x" && r(0).getString(2) == "y")
    assert(r(0).getLong(4) == 5L)
  }
}
