package graft

import org.apache.spark.sql.types._

/** Testdata drift tripwire. The driver regenerates
  * /root/testdata/sf* between rounds and has already changed physical
  * encodings once (events.ts: INT64 nanos → TIMESTAMP_MICROS/NTZ),
  * which silently broke four queries — a throw inside Verify makes a
  * query VANISH from the correctness report rather than show red. This
  * spec fails loudly instead: for every SF it asserts each table loads,
  * is non-empty, and that the columns the engine depends on have the
  * logical types the operators assume (post-normalization for events).
  */
class TestDataSpec extends SparkSpec {

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def typeOf(df: org.apache.spark.sql.DataFrame, c: String): DataType =
    df.schema(c).dataType

  private val numeric: Set[DataType] =
    Set(DoubleType, FloatType, LongType, IntegerType)

  for (dir <- sfDirs) {

    test(s"$dir: all tables load and are non-empty") {
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")) {
        val df = Tables.table(spark, dir, t)
        assert(df.limit(1).count() == 1, s"$t is empty")
      }
    }

    test(s"$dir: lineitem has the columns/types the stocks derivation assumes") {
      val li = Tables.lineitem(spark, dir)
      assert(typeOf(li, "l_returnflag") == StringType)
      assert(typeOf(li, "l_linestatus") == StringType)
      assert(numeric.contains(typeOf(li, "l_extendedprice")),
        s"l_extendedprice is ${typeOf(li, "l_extendedprice")}")
      assert(numeric.contains(typeOf(li, "l_quantity")),
        s"l_quantity is ${typeOf(li, "l_quantity")}")
      // the derivation to_date()s this — any date/timestamp/string works,
      // but a numeric re-encoding would silently produce nulls
      assert(Set[DataType](DateType, TimestampType, TimestampNTZType, StringType)
        .contains(typeOf(li, "l_shipdate")),
        s"l_shipdate is ${typeOf(li, "l_shipdate")}")
    }

    test(s"$dir: events.ts normalizes to TIMESTAMP (any physical encoding)") {
      val ev = Tables.events(spark, dir)
      assert(typeOf(ev, "ts") == TimestampType,
        s"Tables.events must normalize ts to TimestampType; got ${typeOf(ev, "ts")} " +
          "— a new physical encoding needs a case in Tables.normalizeEventTs")
      assert(typeOf(ev, "event_type") == StringType)
      assert(numeric.contains(typeOf(ev, "value")))
      assert(numeric.contains(typeOf(ev, "user_id")))
      // unix_micros is the canonical downstream consumer — must not throw
      val row = ev.selectExpr("unix_micros(ts) AS us").limit(1).collect()
      assert(row.nonEmpty && !row(0).isNullAt(0), "unix_micros(ts) yielded null")
    }

    test(s"$dir: documents/embeddings have the dedup/ANN column shapes") {
      val docs = Tables.documents(spark, dir)
      assert(typeOf(docs, "text") == StringType)
      val emb = Tables.embeddings(spark, dir)
      typeOf(emb, "embedding") match {
        case ArrayType(et, _) =>
          assert(et == FloatType || et == DoubleType, s"element type $et")
        case other => fail(s"embedding is $other, expected array<float|double>")
      }
    }
  }

  test("batch and stream readers agree on the events schema (sf0.001)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft-testdata-spec")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batch = Tables.events(spark, "/root/testdata/sf0.001").schema("ts").dataType
    val stream = graft.streaming.EventStream
      .read(spark, dir.toString).schema("ts").dataType
    assert(batch == stream, s"batch reads ts as $batch but stream as $stream")
  }
}
