package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-adaptive ingest normalization — the reference's most defensive
  * surface: yfinance frames arrive with MultiIndex or whitespace-padded
  * column names, and the target store's adjusted-close column may be
  * spelled four ways or be absent entirely
  * (/root/reference/fetch_and_store_multi.py:41-82 column cleaning,
  * :202-214 adj_close variant probe, :218-242 fallback insert without
  * the column, :148-151 missing-column bail-out).
  *
  * Spark re-expression: name resolution is a driver-side computation
  * over `df.schema` (costs nothing at any data scale); the one
  * data-touching step — the reference's `pd.notna(x) else 0` guards at
  * :160-167 — is a single codegen'd projection, no shuffle.
  */
object Ingest {

  /** Accepted spellings of the adjusted-close column, probe order as in
    * fetch_and_store_multi.py:204.
    */
  val adjCloseVariants: Seq[String] =
    Seq("adj_close", "adjusted_close", "adjclose", "adj close")

  private val priceCols = Seq("open", "high", "low", "close")
  private val requiredCols = "date" +: priceCols :+ "volume"

  /** A flattened-MultiIndex prefix is one ticker-shaped token — the
    * reference joins exactly the (ticker, field) index levels with a
    * space (:64-67), so a multi-word or symbol-laden prefix is not a
    * flatten artifact and must not resolve (a `prev close` or
    * `rolling avg close` column shadowing the real one is worse than
    * dropping it).
    */
  private val tickerShape = "^[a-z0-9.\\-]{1,6}$".r

  /** Resolve one incoming column name to its canonical field with its
    * resolution rank (lower = stronger match), or None for an
    * unrecognized column (dropped, as the reference's INSERT lists only
    * known columns). Rules, in rank order:
    *  0. trim + lowercase exact match (clean_column_names :71-72);
    *  1. adj_close spelling variants (:204-209);
    *  2. flattened-MultiIndex `"<ticker> <field>"` names — exactly one
    *     ticker-shaped leading token before the field.
    */
  private def canonicalRanked(name: String): Option[(String, Int)] = {
    val c = name.trim.toLowerCase
    if (requiredCols.contains(c) || c == "symbol") Some((c, 0))
    else if (adjCloseVariants.contains(c)) Some(("adj_close", 1))
    else adjCloseVariants.collectFirst {
      case v if c.endsWith(" " + v) &&
        tickerShape.matches(c.dropRight(v.length + 1).trim) => ("adj_close", 2)
    }.orElse {
      c.split("\\s+") match {
        case Array(ticker, field) if requiredCols.contains(field) &&
          tickerShape.matches(ticker) => Some((field, 2))
        case _ => None
      }
    }
  }

  def canonical(name: String): Option[String] = canonicalRanked(name).map(_._1)

  /** The reference's NaN/None→0 record preparation (:160-167). */
  private def fillPrice(c: Column): Column =
    coalesce(nanvl(c.cast("double"), lit(0.0)), lit(0.0))

  /** Normalize an arbitrarily-spelled OHLCV frame to the engine's
    * canonical stocks schema
    * `(symbol, date, open, high, low, close, adj_close, volume)`.
    *
    *  - A missing adjusted-close column is tolerated: the output carries
    *    a null `adj_close` — the fixed-schema analog of the reference's
    *    insert-without-the-column fallback (:218-233).
    *  - Any other missing required field fails fast with the reference's
    *    message shape (`Missing columns for ...`, :148-151).
    *  - `symbol` comes from the frame if present, else from the
    *    `symbol` argument (the reference fetches per ticker and passes
    *    the symbol alongside the frame).
    */
  def normalizeSchema(df: DataFrame, symbol: Option[String] = None): DataFrame = {
    // strongest resolution wins per canonical target: an exact-named
    // column always beats a variant or flatten-fallback match, so a
    // spurious `<x> close` column can never shadow a genuine `close`;
    // within a rank, probe order = column order of the incoming frame,
    // like the reference's variant loop
    val byTarget: Map[String, String] = df.columns.toSeq.zipWithIndex
      .flatMap { case (n, i) => canonicalRanked(n).map { case (t, r) => (t, r, i, n) } }
      .groupBy(_._1)
      .map { case (t, xs) => t -> xs.minBy(x => (x._2, x._3))._4 }
    val missing = requiredCols.filterNot(byTarget.contains)
    require(missing.isEmpty,
      s"Missing columns: ${missing.mkString(", ")}; available: ${df.columns.mkString(", ")}")
    val sym: Column = byTarget.get("symbol").map(c => col(c).cast("string"))
      .orElse(symbol.map(s => lit(s)))
      .getOrElse(throw new IllegalArgumentException(
        s"No symbol column and no symbol argument; available: ${df.columns.mkString(", ")}"))
    val adj: Column = byTarget.get("adj_close")
      .map(c => fillPrice(col(c)))
      .getOrElse(lit(null).cast("double"))
    df.select(
      Seq(sym.as("symbol"), col(byTarget("date")).cast("date").as("date")) ++
        priceCols.map(f => fillPrice(col(byTarget(f))).as(f)) ++
        Seq(adj.as("adj_close"),
          coalesce(col(byTarget("volume")).cast("long"), lit(0L)).as("volume")): _*)
  }
}
