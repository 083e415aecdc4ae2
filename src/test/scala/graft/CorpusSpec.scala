package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Corpus

/** End-to-end cleaning verdicts: each reason fires independently,
  * keepers survive, and exactly one copy of a dup group is kept.
  */
class CorpusSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (i, t) =>
      (i, t, "en", "src", Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("manifest merges clean and dedup verdicts into one include row") {
    val spark2 = spark
    import spark2.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs(
      0L -> long, // clean keeper
      1L -> (long + " tail"), // near-dup of 0 via the pair list → drops
      2L -> "too short") // length gate drops it
    val pairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val r = graft.operators.Corpus.manifest(d, pairs, minWords = 30).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Boolean]("include"), x.getAs[String]("manifest_reasons"))).toMap
    assert(r(0L) == ((true, "")))
    assert(r(1L) == ((false, "near_dup")))
    assert(r(2L) == ((false, "too_short")))
  }

  test("funnel: first-drop attribution per stage, quality calibrated on the survivors") {
    val spark2 = spark
    import spark2.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ") // score 0.4, no stopwords
    // 36 words alternating stopword/unique (no repeated bigram, no
    // Gopher flag): stopword_ratio 0.5 → score 0.18 < doc 0's 0.4
    val sw = Seq("the", "a", "of", "and", "is", "in", "to", "for", "on", "with")
    val lowQ = (0 until 18).flatMap(i => Seq(sw(i % 10), s"v$i")).mkString(" ")
    val d = docs(
      0L -> long, // survives every stage (its score IS the threshold)
      1L -> "too short", // stage 1
      2L -> (1 to 40).map(_ => "spam").mkString(" "), // stage 2 (repetitive)
      3L -> long, // exact copy of 0 → stage 3
      4L -> (long + " tail"), // near-dup of 0 via the pair list → stage 4
      5L -> lowQ) // stage 5: below the calibrated threshold
    val pairs = Seq((0L, 4L)).toDF("doc_a", "doc_b")
    val r = Corpus.funnel(d, pairs, minWords = 30, p = 0.5).collect()
      .map(x => x.getInt(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1) == (("too_short", 6L, 1L, 5L)), s"stage1: ${r(1)}")
    assert(r(2) == (("repetitive", 5L, 1L, 4L)), s"stage2: ${r(2)}")
    assert(r(3) == (("exact_dup", 4L, 1L, 3L)), s"stage3: ${r(3)}")
    assert(r(4) == (("near_dup", 3L, 1L, 2L)), s"stage4: ${r(4)}")
    assert(r(5) == (("low_quality", 2L, 1L, 1L)), s"stage5: ${r(5)}")
  }

  test("funnelEmbed: planted embedding twin drops at semantic_dup; no-embedding doc passes through") {
    val spark2 = spark
    import spark2.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val sw = Seq("the", "a", "of", "and", "is", "in", "to", "for", "on", "with")
    val lowQ = (0 until 18).flatMap(i => Seq(sw(i % 10), s"v$i")).mkString(" ")
    val d = docs(
      0L -> long, // survives every stage
      1L -> "too short", // stage 1
      2L -> (1 to 40).map(_ => "spam").mkString(" "), // stage 2
      3L -> long, // exact copy of 0 → stage 3
      4L -> (long + " tail"), // near-dup of 0 via the pair list → stage 4
      5L -> lowQ, // semantic keeper, below the calibrated threshold → stage 6
      6L -> (1 to 40).map(i => s"u$i").mkString(" "), // clean TEXT, embedding twin of 0 → stage 5
      7L -> (1 to 40).map(i => s"q$i").mkString(" ")) // clean, NO embedding row → kept
    val pairs = Seq((0L, 4L)).toDF("doc_a", "doc_b")
    // survivors of the text stages are {0, 5, 6, 7}; embeddings exist
    // for {0, 5, 6} → cells = ceil(sqrt(3)) = 2, seeds 0 and 5; doc 6
    // lands in doc 0's cell at cos ≈ 0.99995 ≥ 0.9 and drops against
    // the lower-id original; doc 7 has no vector → cannot be a
    // semantic dup → flows to the quality gate and survives
    val e = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (5L, Array(0f, 1f, 0f, 0f)),
      (6L, Array(0.99f, 0.01f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    // calibration runs on the semantic keepers {0, 5, 7}: kcut =
    // floor(0.7·3) = 2 → thr = 0.4 (docs 0/7 tie at the threshold,
    // doc 5's stopword-heavy 0.18 falls below)
    val r = Corpus.funnelEmbed(d, pairs, e, minWords = 30, p = 0.7, tau = 0.9)
      .collect()
      .map(x => x.getInt(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1) == (("too_short", 8L, 1L, 7L)), s"stage1: ${r(1)}")
    assert(r(2) == (("repetitive", 7L, 1L, 6L)), s"stage2: ${r(2)}")
    assert(r(3) == (("exact_dup", 6L, 1L, 5L)), s"stage3: ${r(3)}")
    assert(r(4) == (("near_dup", 5L, 1L, 4L)), s"stage4: ${r(4)}")
    assert(r(5) == (("semantic_dup", 4L, 1L, 3L)), s"stage5: ${r(5)}")
    assert(r(6) == (("low_quality", 3L, 1L, 2L)), s"stage6: ${r(6)}")
  }

  test("manifestScrubbed chains the span scrub: reasons merge, include unchanged") {
    val spark2 = spark
    import spark2.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val tail0 = (1 to 30).map(i => s"x$i").mkString(" ")
    val tail1 = (1 to 30).map(i => s"y$i").mkString(" ")
    val d = docs(
      0L -> s"$boiler $tail0", // shares the 8-word boilerplate → scrubbed
      1L -> s"$boiler $tail1", // ditto — both stay includable
      2L -> (1 to 40).map(i => s"z$i").mkString(" "), // untouched clean
      3L -> "too short") // drops regardless of scrub
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val r = graft.operators.Corpus.manifestScrubbed(d, pairs, minWords = 30)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // the scrub is a transform, not an exclusion: 0/1 keep include=true
    assert(r(0L).getAs[Boolean]("include") &&
      r(0L).getAs[String]("manifest_reasons") == "span_scrubbed")
    assert(r(0L).getAs[Long]("n_removed") == 8L &&
      r(0L).getAs[String]("cleaned_text") == tail0)
    assert(r(1L).getAs[Boolean]("include") &&
      r(1L).getAs[Long]("n_removed") == 8L)
    assert(r(2L).getAs[Boolean]("include") &&
      r(2L).getAs[String]("manifest_reasons") == "" &&
      r(2L).getAs[Long]("n_removed") == 0L)
    // exclusion reasons and the scrub reason merge in order
    assert(!r(3L).getAs[Boolean]("include") &&
      r(3L).getAs[String]("manifest_reasons") == "too_short")
  }

  test("report: the one-row rollup ties out against the per-doc artifact") {
    val spark2 = spark
    import spark2.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = docs(
      0L -> s"$boiler ${(1 to 30).map(i => s"x$i").mkString(" ")}",
      1L -> s"$boiler ${(1 to 30).map(i => s"y$i").mkString(" ")}",
      2L -> (1 to 40).map(i => s"z$i").mkString(" "),
      3L -> "too short")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val r = graft.operators.Corpus.report(d, pairs, minWords = 30).head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_include") == 3L)
    assert(r.getAs[Double]("include_rate") == 0.75)
    assert(r.getAs[Long]("n_too_short") == 1L)
    assert(r.getAs[Long]("n_span_scrubbed") == 2L)
    assert(r.getAs[Long]("n_exact_dup") == 0L && r.getAs[Long]("n_near_dup") == 0L)
    val total = r.getAs[Long]("tokens_total")
    assert(total == 38L + 38L + 40L + 2L)
    assert(r.getAs[Long]("tokens_scrubbed") == 16L)
    assert(r.getAs[Double]("scrub_rate") ==
      BigDecimal(16.0 / total).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("sourceVocabStats: types, hapax, and TTR per source") {
    val spark2 = spark
    import spark2.implicits._
    val d = Seq(
      (0L, "a b a", "en", "srcA", 5L),
      (1L, "c a", "en", "srcA", 3L),
      (2L, "x x x x", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Corpus.sourceVocabStats(d).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val a = r("srcA")
    assert(a.getAs[Long]("n_docs") == 2L && a.getAs[Long]("n_tokens") == 5L)
    assert(a.getAs[Long]("n_types") == 3L && a.getAs[Long]("hapax") == 2L)
    assert(a.getAs[Double]("ttr") == 0.6 && a.getAs[Double]("hapax_frac") == 0.666667)
    val b = r("srcB")
    assert(b.getAs[Long]("n_types") == 1L && b.getAs[Long]("hapax") == 0L)
    assert(b.getAs[Double]("ttr") == 0.25 && b.getAs[Double]("hapax_frac") == 0.0)
  }

  test("cleanVerdicts: dup / short / repetitive / clean partition correctly") {
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val spam = long + " " + ("buy now click here " * 15).trim
    val d = docs(
      (0L, long), // clean keeper
      (1L, long), // exact dup of 0 → dropped
      (2L, "just a few words"), // too_short
      (3L, spam), // repetitive (60 distinct + 60 spam words ≥ 30 → not short)
      (4L, long + " extra"), // clean
      (5L, null)) // null text → the emptiest doc → too_short, never keep
    val r = Corpus.cleanVerdicts(d, minWords = 30).collect()
      .map(x => x.getLong(0) -> (x.getBoolean(1), x.getString(2))).toMap
    assert(r(0L) == (true, ""))
    assert(r(1L) == (false, "exact_dup"))
    assert(r(2L) == (false, "too_short"))
    assert(r(3L) == (false, "repetitive"))
    assert(r(4L) == (true, ""))
    assert(r(5L) == (false, "too_short"))
  }

  test("mixAllocation: largest-remainder quotas sum exactly to the budget") {
    val spark2 = spark
    import spark2.implicits._
    // srcA 9 tokens (√=3 → s=3e6), srcB 16 (√=4 → s=4e6), budget 10:
    // base A = (10·3e6) div 7e6 = 4 (rem 2e6), base B = 5 (rem 5e6);
    // Σbase = 9 → R = 1, the larger remainder (B) takes the extra token
    val d = Seq(
      (0L, (1 to 9).map(_ => "t").mkString(" "), "en", "srcA", 9L),
      (1L, (1 to 16).map(_ => "t").mkString(" "), "en", "srcB", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Corpus.mixAllocation(d, 10L).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("srcA").getAs[Long]("w_scaled") == 3000000L)
    assert(r("srcB").getAs[Long]("w_scaled") == 4000000L)
    assert(r("srcA").getAs[Long]("target_tokens") == 4L)
    assert(r("srcB").getAs[Long]("target_tokens") == 6L)
    assert(r.values.map(_.getAs[Long]("target_tokens")).sum == 10L,
      "quotas must sum exactly to the budget")
    assert(r("srcA").getAs[Double]("epochs") == 0.4444)
    assert(r("srcB").getAs[Double]("epochs") == 0.375)
  }

  test("mixMaterialize: full epochs replicate, the partial epoch truncates at the quota boundary") {
    val spark2 = spark
    import spark2.implicits._
    // srcA = docs 0 (4 tokens) + 2 (5 tokens) → t=9, srcB = doc 1 (16
    // tokens) → t=16; budget 30 apportions A=13, B=17 (largest
    // remainder). A: one full epoch (9) + partial rem=4; md5 order puts
    // doc 2 ("c81e…") before doc 0 ("cfcd…"), so the partial epoch is
    // doc 2 truncated 5→4. B: one full epoch (16) + doc 1 truncated
    // 16→1. Grand total = exactly the budget.
    val d = Seq(
      (0L, "t t t t", "en", "srcA", 7L),
      (2L, "t t t t t", "en", "srcA", 9L),
      (1L, (1 to 16).map(_ => "t").mkString(" "), "en", "srcB", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Corpus.mixMaterialize(d, 30L).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[Long]("epoch")) ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"))).toMap
    assert(r(("srcA", 0L)) == ((2L, 9L)))
    assert(r(("srcA", 1L)) == ((1L, 4L)), "partial epoch: doc 2 truncated 5→4")
    assert(r(("srcB", 0L)) == ((1L, 16L)))
    assert(r(("srcB", 1L)) == ((1L, 1L)), "partial epoch: doc 1 truncated 16→1")
    assert(r.values.map(_._2).sum == 30L,
      "materialized tokens must sum exactly to the budget")
  }

  test("mixPackShard: budget survives shard+pack exactly; offsets are " +
      "gapless per shard and the pack layout is arithmetic over them") {
    val spark2 = spark
    import spark2.implicits._
    val d = (0 until 40).map(i => (i.toLong,
        (1 to (3 + i % 7)).map(_ => "t").mkString(" "),
        "en", s"src${i % 3}", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val budget = 500L
    val rows = Corpus.mixPackShard(d, budget, capacity = 16L, shards = 4)
      .collect()
    // the apportionment identity survives both stages
    assert(rows.map(_.getAs[Long]("toks_out")).sum == budget)
    // per shard: offsets are an exact gapless running sum in pos order
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, sh) =>
      val inOrder = sh.sortBy(_.getAs[Long]("pos"))
      var cum = 0L
      inOrder.foreach { r =>
        assert(r.getAs[Long]("tok_offset") == cum)
        assert(r.getAs[Long]("pack_id") == cum / 16)
        assert(r.getAs[Long]("pack_pos") == cum % 16)
        assert(r.getAs[Boolean]("straddles") ==
          (cum % 16 + r.getAs[Long]("toks_out") > 16))
        cum += r.getAs[Long]("toks_out")
      }
    }
    // every shard used (40+ instances over 4 hash shards) and positions
    // are dense from 0
    val shards = rows.map(_.getAs[Long]("shard")).toSet
    assert(shards == Set(0L, 1L, 2L, 3L))
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (s, sh) =>
      assert(sh.map(_.getAs[Long]("pos")).sorted.toSeq ==
        (0L until sh.length).toSeq, s"shard $s positions not dense")
    }
    // the rollup of the instance stream equals mixMaterialize
    val viaDocs = Corpus.mixMaterializeDocs(d, budget)
      .groupBy("source", "epoch")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum("toks_out").as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val direct = Corpus.mixMaterialize(d, budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(viaDocs == direct)
  }

  test("mixPackShard splitAtBoundary: every pack holds exactly capacity " +
      "tokens except the final pack per shard; segments tile instances") {
    val spark2 = spark
    import spark2.implicits._
    val d = (0 until 40).map(i => (i.toLong,
        (1 to (3 + i % 7)).map(_ => "t").mkString(" "),
        "en", s"src${i % 3}", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val budget = 500L
    val cap = 16L
    val segs = Corpus.mixPackShard(d, budget, capacity = cap, shards = 4,
      splitAtBoundary = true).collect()
    // token conservation: the split changes layout, never totals
    assert(segs.map(_.getAs[Long]("seg_tokens")).sum == budget)
    segs.groupBy(_.getAs[Long]("shard")).foreach { case (s, sh) =>
      // every pack full except the last per shard
      val byPack = sh.groupBy(_.getAs[Long]("pack_id"))
        .map { case (p, rs) => p -> rs.map(_.getAs[Long]("seg_tokens")).sum }
      val lastPack = byPack.keys.max
      byPack.foreach { case (p, tok) =>
        if (p < lastPack) assert(tok == cap,
          s"shard $s pack $p holds $tok tokens, want $cap")
        else assert(tok >= 1 && tok <= cap)
      }
      // pack ids are dense from 0 per shard
      assert(byPack.keySet == (0L to lastPack).toSet)
      // within a pack, segments tile it gaplessly in pack_pos order
      sh.groupBy(_.getAs[Long]("pack_id")).foreach { case (p, rs) =>
        var at = 0L
        rs.sortBy(_.getAs[Long]("pack_pos")).foreach { r =>
          assert(r.getAs[Long]("pack_pos") == at,
            s"shard $s pack $p has a gap at $at")
          at += r.getAs[Long]("seg_tokens")
        }
      }
      // per instance: seg_index dense 0..n_segs-1, segments sum to the
      // unsplit instance's toks_out
      sh.groupBy(r => (r.getAs[Long]("pos"))).foreach { case (_, rs) =>
        val n = rs.head.getAs[Long]("n_segs")
        assert(rs.length.toLong == n)
        assert(rs.map(_.getAs[Long]("seg_index")).sorted.toSeq ==
          (0L until n).toSeq)
      }
    }
    // the unsplit frame rolls up to the same per-instance tokens
    val unsplit = Corpus.mixPackShard(d, budget, capacity = cap, shards = 4)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("toks_out")).toMap
    val rolled = segs.groupBy(r =>
        (r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("seg_tokens")).sum }
    assert(rolled == unsplit, "split segments must tile each instance")
  }

  test("clusterTopics: each cell is labeled by its own vocabulary; stopwords and short tokens gated") {
    val spark2 = spark
    import spark2.implicits._
    val d = Seq(
      (0L, "apple banana the apple crunch is it", "en", "src", 1L),
      (1L, "carrot daikon the carrot roast is it", "en", "src", 1L),
      (2L, "apple banana a orchard crunch is it", "en", "src", 1L),
      (3L, "carrot daikon a cellar roast is it", "en", "src", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // two tight clusters: even docs near +1, odd docs near -1
    val e = Seq(0L, 1L, 2L, 3L).map { id =>
      (id, (0 until 4).map(j =>
        ((if (id % 2 == 0) 1.0 else -1.0) + ((id * 7 + j) % 5) * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
    val r = Corpus.clusterTopics(d, e, cells = 2, iters = 2, topK = 3).collect()
    val byCell = r.groupBy(_.getAs[Long]("cell"))
    assert(byCell.size == 2)
    val top = byCell.map { case (c, rows) =>
      c -> rows.filter(_.getAs[Int]("rnk") == 1).head.getAs[String]("term")
    }
    // the apple cluster's top term is its dominant in-cluster word
    assert(top.values.toSet == Set("apple", "carrot"), s"got $top")
    val terms = r.map(_.getAs[String]("term")).toSet
    assert(!terms.exists(t => t.length < 3 || Set("the", "a", "is", "in").contains(t)),
      s"stopwords/short tokens must be gated, got $terms")
    // tf carried through: apple appears 3x inside its cell
    assert(r.find(x => x.getAs[String]("term") == "apple")
      .get.getAs[Long]("tf") == 3L)
  }

  test("sourceMixWeights: τ=1/2 up-weights the small source, weights sum to 1") {
    val spark2 = spark
    import spark2.implicits._
    // srcA 9 tokens (√=3), srcB 16 tokens (√=4): w_prop 0.36/0.64,
    // w_temp 3/7 and 4/7 — the small source's share rises
    val d = Seq(
      (0L, (1 to 9).map(_ => "t").mkString(" "), "en", "srcA", 9L),
      (1L, (1 to 16).map(_ => "t").mkString(" "), "en", "srcB", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Corpus.sourceMixWeights(d).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (wtA, wtB) = (r6(3.0 / 7.0), r6(4.0 / 7.0))
    assert(r("srcA").getAs[Long]("n_tokens") == 9L)
    assert(r("srcA").getAs[Double]("w_prop") == 0.36)
    assert(r("srcA").getAs[Double]("w_temp") == wtA)
    assert(r("srcB").getAs[Double]("w_prop") == 0.64)
    assert(r("srcB").getAs[Double]("w_temp") == wtB)
    assert(r("srcA").getAs[Double]("boost") == r4(wtA / 0.36))
    assert(r("srcB").getAs[Double]("boost") == r4(wtB / 0.64))
    assert(r("srcA").getAs[Double]("boost") > 1.0 && r("srcB").getAs[Double]("boost") < 1.0)
  }
}
