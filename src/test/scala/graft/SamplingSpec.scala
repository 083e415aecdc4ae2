package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic hash sampling / splits / quotas. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("hashBucket is stable, in range, and spread") {
    val b = docs.select(Sampling.hashBucket(col("text"), 100).as("b"))
    val vals = b.collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0 && v < 100))
    assert(vals.distinct.length > 50) // 500 docs over 100 buckets: wide spread
    val again = docs.select(Sampling.hashBucket(col("text"), 100).as("b"))
      .collect().map(_.getLong(0))
    assert(vals.toSeq == again.toSeq)
  }

  test("withSplit partitions every row into exactly one split") {
    val s = Sampling.withSplit(docs, col("text"), 90, 5)
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == docs.count())
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts("train") > counts.getOrElse("val", 0L))
  }

  test("shuffleShards: every doc placed once, dense positions, stable, scattered") {
    val sh = Sampling.shuffleShards(docs.select("doc_id", "text"),
      col("text"), col("doc_id"), 16)
    val rows = sh.select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // a permutation: one row per doc, shards in range
    assert(rows.length == docs.count())
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 16 })
    // positions are dense 0..n_i-1 within each shard
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq)
    }
    // contiguous doc-id runs scatter: the first 32 ids hit many shards
    assert(rows.filter(_._1 < 32).map(_._2).distinct.length >= 8)
    // stable across re-evaluation
    val again = Sampling.shuffleShards(docs.select("doc_id", "text"),
      col("text"), col("doc_id"), 16)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("sampleByHash: edge rates, monotone containment, determinism") {
    assert(Sampling.sampleByHash(docs, col("text"), 0.0).count() == 0)
    assert(Sampling.sampleByHash(docs, col("text"), 1.0).count() == docs.count())
    val at20 = Sampling.sampleByHash(docs, col("text"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val at50 = Sampling.sampleByHash(docs, col("text"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(at20.subsetOf(at50))
    assert(at20.nonEmpty && at50.size < docs.count())
  }

  test("quotaPerGroup caps each group at n with score-desc id-asc order") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      ("en", 1L, 0.9), ("en", 2L, 0.9), ("en", 3L, 0.5), ("en", 4L, 1.0),
      ("fr", 5L, 0.1), ("fr", 6L, 0.2)).toDF("lang", "id", "score")
    val q = Sampling.quotaPerGroup(df, col("lang"), col("score"), col("id"), 2)
      .orderBy("lang", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    // en: 4 (1.0) then the id-tiebreak keeps 1 over 2; fr keeps both
    assert(q.toSeq == Seq(("en", 4L, 1), ("en", 1L, 2), ("fr", 6L, 1), ("fr", 5L, 2)))
  }

  test("tokenBudgetPerGroup: quality order, crossing doc kept, every group contributes") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      // en by score desc: id 1 (4 tok, cum 4), id 2 (4, cum 8), id 3 (4, cum 12)
      ("en", 1L, 0.9, 4L), ("en", 2L, 0.8, 4L), ("en", 3L, 0.7, 4L),
      // fr: one doc far over budget — still kept (starts at 0)
      ("fr", 4L, 0.5, 100L)).toDF("lang", "id", "score", "tokens")
    val kept = Sampling.tokenBudgetPerGroup(df, col("lang"), col("score"),
        col("id"), col("tokens"), budget = 7L)
      .orderBy("lang", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("cum_tokens")))
    // en keeps ids 1 (starts at 0) and 2 (starts at 4 < 7, crosses to 8);
    // id 3 starts at 8 ≥ 7 and is dropped; fr's single huge doc survives
    assert(kept.toSeq == Seq(("en", 1L, 4L), ("en", 2L, 8L), ("fr", 4L, 100L)))
  }

  test("dsirWeights ranks target-like documents above off-domain ones") {
    val spark2 = spark
    import spark2.implicits._
    val d = Seq(
      (0L, "alpha beta gamma delta", "wiki"),
      (1L, "alpha beta gamma delta", "web"), // looks exactly like the target
      (2L, "spam click buy now", "web"), // shares nothing with the target
      (3L, "alpha beta spam click", "web")) // half-and-half
      .map { case (i, t, s) => (i, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Sampling.dsirWeights(d, "wiki", buckets = 64).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Double]("dsir_logw"))).toMap
    assert(r.values.forall(_._1 == 4L))
    // target-vocabulary docs must outscore the disjoint-vocabulary doc,
    // with the mixed doc in between
    assert(r(1L)._2 == r(0L)._2) // identical text → identical weight
    assert(r(1L)._2 > r(3L)._2 && r(3L)._2 > r(2L)._2)
  }

  test("cvFolds: content-keyed folds, per-lang totals, stable across runs") {
    val spark2 = spark
    import spark2.implicits._
    val d = (0 until 40).map(i => (i.toLong, s"doc number $i words", Seq("en", "de")(i % 2), "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r1 = Sampling.cvFolds(d, 2).collect()
    val r2 = Sampling.cvFolds(d, 2).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq) // deterministic
    // per-lang fold counts sum to the lang total and ratios follow
    val byLang = r1.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rows) =>
      val total = rows.head.getAs[Long]("lang_total")
      assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
      rows.foreach { r =>
        assert(r.getAs[Double]("ratio") ==
          BigDecimal(r.getAs[Long]("n_docs") * 2.0 / total)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  test("weightedSample: deterministic, capped at k, zero-weight excluded") {
    val s1 = Sampling.weightedSample(docs, size(split(col("text"), " ")), 20)
      .collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.weightedSample(docs, size(split(col("text"), " ")), 20)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.length == 20 && s1.distinct.length == 20)
    // zero/negative weights have zero inclusion probability
    val none = Sampling.weightedSample(docs, lit(0), 20)
    assert(none.isEmpty)
  }

  test("weightedSample: a dominant weight is always drawn, ES keys ordered") {
    val spark2 = spark
    import spark2.implicits._
    // one doc carries 10^6 x the weight of the rest: its ES key
    // u^(1/w) ~ 1 beats 50 unit-weight docs' keys w.h.p. — and with
    // the fixed content hashes this fixture is deterministic, so
    // "w.h.p." is checkable as a constant
    val d = ((1 to 50).map(i => (i.toLong, s"light doc number $i", 1L)) :+
      (99L, "the heavy document", 1000000L)).toDF("doc_id", "text", "w")
    val got = Sampling.weightedSample(d, col("w"), 5).collect()
    assert(got.map(_.getLong(0)).contains(99L))
    val keys = got.map(_.getAs[Double]("es_key")).toSeq
    assert(keys == keys.sorted.reverse) // descending
  }

  test("weightedSample keeps fractional weights (no silent long truncation)") {
    val spark2 = spark
    import spark2.implicits._
    // sub-1 weights would all truncate to 0 under a long cast and the
    // sample would come back empty; as doubles they sample fine and a
    // 100x heavier fractional weight dominates
    val d = ((1 to 20).map(i => (i.toLong, s"light doc number $i", 0.01)) :+
      (99L, "the heavy document", 1.0)).toDF("doc_id", "text", "w")
    val got = Sampling.weightedSample(d, col("w"), 5).collect()
    assert(got.length == 5)
    assert(got.map(_.getLong(0)).contains(99L))
    assert(got.head.getAs[Double]("w") == 1.0 ||
      got.exists(_.getAs[Double]("w") == 0.01))
  }

  test("weightedSampleLogW ranks identically to weightedSample with w = exp(lw)") {
    val spark2 = spark
    import spark2.implicits._
    // the Gumbel identity: ln(-ln u) - lw ascending == u^(1/exp(lw))
    // descending. Moderate lw keeps exp(lw) exactly representable so
    // the linear-space reference is itself trustworthy.
    val d = (1 to 40).map(i =>
      (i.toLong, s"doc body number $i with tail", (i % 7 + 1).toDouble))
      .toDF("doc_id", "text", "w")
    val lin = Sampling.weightedSample(d, col("w"), 15)
      .collect().map(_.getLong(0)).toSeq
    val logs = Sampling.weightedSampleLogW(d, log(col("w")), 15)
      .collect().map(_.getLong(0)).toSeq
    assert(logs == lin, s"log-space ranking $logs != linear $lin")
  }
}
