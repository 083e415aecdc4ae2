package graft

import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Ingest, Merge, Quality}

/** Property-based invariants over randomized batches (SURVEY.md §5.3):
  * merge algebra and quality partitioning hold for arbitrary inputs,
  * not just the crafted fixtures.
  */
class PropertiesSpec extends SparkSpec {

  /** Deterministic sampling from a Gen (no scalatestplus bridge in the
    * offline cache): fixed seeds → reproducible cases.
    */
  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val symGen = Gen.oneOf("A", "B", "C")
  private val dayGen = Gen.choose(1, 28)
  private val rowGen = for {
    s <- symGen; d <- dayGen; v <- Gen.choose(1, 1000)
  } yield (s, d, v.toDouble)
  private val batchGen = Gen.listOfN(30, rowGen)

  private def df(rows: List[(String, Int, Double)]): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (s, d, v) => (s, Date.valueOf(f"2020-01-$d%02d"), v) }
      .toDF("symbol", "date", "close")
      // collapse duplicate PKs inside a batch (a batch is a snapshot)
      .groupBy("symbol", "date").agg(max("close").as("close"))
  }

  private def pkSet(d: DataFrame) =
    d.select("symbol", "date").collect().map(r => (r.getString(0), r.getDate(1))).toSet

  test("property: upsert PK-union, uniqueness, and last-wins dominance") {
    cases(Gen.zip(batchGen, batchGen), 8).foreach { case (a, b) =>
      {
        val (ta, tb) = (df(a), df(b))
        val merged = Merge.upsert(ta, tb)
        // PK set = union of inputs' PK sets
        assert(pkSet(merged) == (pkSet(ta) ++ pkSet(tb)))
        // PKs unique
        assert(merged.groupBy("symbol", "date").count()
          .filter(col("count") > 1).count() == 0)
        // every update row survives verbatim
        val mm = merged.collect()
          .map(r => (r.getString(0), r.getDate(1)) -> r.getDouble(2)).toMap
        tb.collect().foreach { r =>
          assert(mm((r.getString(0), r.getDate(1))) == r.getDouble(2))
        }
      }
    }
  }

  test("property: insertIgnore keeps target rows verbatim") {
    cases(Gen.zip(batchGen, batchGen), 8).foreach { case (a, b) =>
      {
        val (ta, tb) = (df(a), df(b))
        val merged = Merge.insertIgnore(ta, tb)
        val mm = merged.collect()
          .map(r => (r.getString(0), r.getDate(1)) -> r.getDouble(2)).toMap
        ta.collect().foreach { r =>
          assert(mm((r.getString(0), r.getDate(1))) == r.getDouble(2))
        }
        assert(pkSet(merged) == (pkSet(ta) ++ pkSet(tb)))
      }
    }
  }

  test("property: quality verdict partitions every input row exactly once") {
    val barGen = for {
      s <- symGen; d <- dayGen
      o <- Gen.choose(-5.0, 50.0); h <- Gen.choose(-5.0, 50.0)
      l <- Gen.choose(-5.0, 50.0); c <- Gen.choose(-5.0, 50.0)
      v <- Gen.choose(-10L, 100L)
    } yield (s, d, o, h, l, c, v)
    cases(Gen.listOfN(40, barGen), 8).foreach { rows =>
      {
        val spark2 = spark
        import spark2.implicits._
        val d = rows.zipWithIndex.map { case ((s, dd, o, h, l, c, v), i) =>
          (s, Date.valueOf(f"2020-02-${dd % 28 + 1}%02d"), o, h, l, c, o, v, i.toLong)
        }.toDF("symbol", "date", "open", "high", "low", "close", "adj_close", "volume", "row_id")
        val verdict = Quality.withVerdict(d)
        val valid = verdict.filter(col("is_valid")).count()
        val invalid = verdict.filter(!col("is_valid")).count()
        assert(valid + invalid == rows.length)
        // independent scala-side re-implementation of the reference
        // battery (fetch_and_store.py:60-120) must agree row by row
        verdict.collect().foreach { r =>
          val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
            r.getAs[Double]("low"), r.getAs[Double]("close"))
          val v = r.getAs[Long]("volume")
          val expectValid = o > 0 && h > 0 && l > 0 && c > 0 && v >= 0 &&
            h >= l && h >= math.max(o, c) && l <= math.min(o, c) &&
            math.abs(c - o) / o <= 0.5
          assert(r.getAs[Boolean]("is_valid") == expectValid,
            s"row ${r.getAs[Long]("row_id")}: ($o,$h,$l,$c,$v)")
        }
      }
    }
  }

  test("property: chunkWords covers every word at its position, for arbitrary geometry") {
    val spark2 = spark
    import spark2.implicits._
    val geomGen = for {
      len <- Gen.choose(1, 300)
      width <- Gen.choose(1, 80)
      stride <- Gen.choose(1, width)
    } yield (len, width, stride)
    cases(geomGen, 12).foreach { case (len, width, stride) =>
      val text = (1 to len).map(i => s"w$i").mkString(" ")
      val d = Seq((0L, text)).toDF("doc_id", "text")
      val chunks = graft.operators.TextOps.chunkWords(d, width, stride)
        .collect().map(r => (r.getInt(1), r.getString(2).split(" "), r.getInt(3)))
      // chunk j starts at word j·stride+1 and holds min(width, len-j·stride) words
      chunks.foreach { case (j, ws, nw) =>
        assert(ws.head == s"w${j * stride + 1}", s"geom=($len,$width,$stride) chunk $j")
        assert(nw == math.min(width, len - j * stride) && ws.length == nw)
      }
      // expected chunk count, and the union of chunks covers every word
      val expected = if (len <= width) 1
        else math.ceil((len - width).toDouble / stride).toInt + 1
      assert(chunks.length == expected, s"geom=($len,$width,$stride)")
      assert(chunks.flatMap(_._2).distinct.length == len)
    }
  }

  test("property: Ingest.canonical is padding/case-invariant and never mis-maps") {
    val fields = Seq("date", "open", "high", "low", "close", "volume", "symbol")
    val padGen = Gen.oneOf("", " ", "  ", "\t")
    val caseGen = Gen.oneOf[String => String](
      identity[String] _, (x: String) => x.toUpperCase, (x: String) => x.capitalize)
    val nameGen = for {
      f <- Gen.oneOf(fields ++ Ingest.adjCloseVariants)
      pre <- padGen; post <- padGen; cs <- caseGen
      // flattened-MultiIndex ticker prefixes occur on data fields only
      ticker <- if (f == "symbol") Gen.const("") else Gen.oneOf("", "AAPL ", "msft ")
    } yield (f, pre + cs(ticker + f) + post)
    cases(Gen.listOfN(50, nameGen), 6).foreach(_.foreach { case (f, mangled) =>
      val expected = if (Ingest.adjCloseVariants.contains(f)) "adj_close" else f
      assert(Ingest.canonical(mangled).contains(expected), s"'$mangled' -> $expected")
    })
    // unknown names never resolve
    cases(Gen.listOfN(30, Gen.oneOf("dividends", "splits", "Stock Splits", "oPen x")), 3)
      .foreach(_.foreach(n => assert(Ingest.canonical(n).isEmpty, n)))
  }

  test("property: a batched-BPE round's selected merges commute — any " +
      "application order rewrites every state identically") {
    val spark2 = spark
    import spark2.implicits._
    // random small-alphabet corpora force crowded candidate windows
    // (many conflicting top pairs) — the regime the rank-window rule
    // filters; whatever SURVIVES selection must commute, which is the
    // exact property the one-pass batch application leans on
    val wordGen = Gen.choose(2, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")))
      .map(_.mkString)
    val corpusGen = Gen.listOfN(40, wordGen)
    cases(corpusGen, 6).foreach { words =>
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w, "en", "s", w.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      // rounds = 2: round-2 windows rank pairs over MULTI-CHAR symbols
      // created in round 1, so the merged-equals-symbol conflict regime
      // (a window candidate whose result IS another's symbol) is
      // reachable — rounds = 1 could only ever exercise the
      // single-char-symbol disjointness clause
      val sel = graft.operators.TextOps
        .bpeTrainMergesBatched(docs, rounds = 2, batchSize = 4)
        .collect()
        .map(r => (r.getAs[Int]("round"),
          r.getAs[String]("pair_left"), r.getAs[String]("pair_right")))
        .toSeq
      // String.replace = left-to-right non-overlapping, the same
      // semantics as the engine's replace expression
      def applyRounds(byRound: Seq[Seq[(String, String)]], w: String): String =
        byRound.foldLeft(w.map(c => s"·${c}·").mkString) { (st0, roundSel) =>
          roundSel.foldLeft(st0) { case (st, (l, r)) =>
            st.replace(s"·${l}··${r}·", s"·${l}${r}·") }
        }
      // the commutativity claim is PER ROUND (rounds apply in order —
      // a later round's merges consume earlier rounds' symbols by
      // design): permute each round's batch independently
      val roundsInOrder = sel.map(_._1).distinct.sorted
      def perms(round: Int) = sel.collect { case (`round`, l, r) => (l, r) }
        .permutations.take(4).toSeq
      val orderings = roundsInOrder.foldLeft(Seq(Seq.empty[Seq[(String, String)]])) {
        (acc, round) => acc.flatMap(pre => perms(round).map(pre :+ _))
      }.take(16)
      words.distinct.foreach { w =>
        val fwd = applyRounds(
          roundsInOrder.map(rd => sel.collect { case (`rd`, l, r) => (l, r) }), w)
        orderings.foreach { o =>
          assert(applyRounds(o, w) == fwd,
            s"within-round order $o diverged from $fwd on '$w' (sel=$sel)")
        }
      }
    }
  }

  test("property: selectBatchWindow drops pattern-creating candidates " +
      "(merged string equal to a co-windowed candidate's symbol)") {
    // the ADVICE-flagged regime, pinned deterministically: (ab,c) at
    // rank 1 merges to 'abc'; (abc,d) at rank 3 CONSUMES that symbol —
    // one-pass application would be order-dependent (applying (ab,c)
    // first creates new ·abc··d· sites), so rank 3 must be dropped.
    // (a,bc) at rank 2 also merges to 'abc' but shares no symbol and
    // no merged-equals-symbol relation with rank 1 — two replaces with
    // EQUAL results still commute (neither creates the other's
    // pattern), so it stays.
    val window = Seq(
      (1, "ab", "c", 50L),
      (2, "a", "bc", 40L),
      (3, "abc", "d", 30L),
      (4, "x", "y", 20L))
    val kept = graft.operators.TextOps.selectBatchWindow(window)
    assert(kept == Seq(
      (1, "ab", "c", 50L), (2, "a", "bc", 40L), (4, "x", "y", 20L)))
    // the reverse direction: a LOWER-ranked candidate whose merged
    // string is a higher-ranked candidate's symbol must also drop —
    // (b,c)→'bc' would create occurrences of rank-1's right symbol
    val window2 = Seq(
      (1, "a", "bc", 50L),
      (2, "b", "c", 40L))
    assert(graft.operators.TextOps.selectBatchWindow(window2) ==
      Seq((1, "a", "bc", 50L)))
  }
}
