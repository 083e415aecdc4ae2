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

  /** Resolve one incoming column name to its canonical field, or None
    * for an unrecognized column (dropped, as the reference's INSERT
    * lists only known columns). Rules, in order:
    *  1. trim + lowercase exact match (clean_column_names :71-72);
    *  2. adj_close spelling variants (:204-209);
    *  3. flattened-MultiIndex `"<ticker> <field>"` names — the
    *     reference's fallback joins index levels with a space (:64-67),
    *     so the trailing token(s) carry the field.
    */
  def canonical(name: String): Option[String] = {
    val c = name.trim.toLowerCase
    if (requiredCols.contains(c) || c == "symbol") Some(c)
    else if (adjCloseVariants.contains(c)) Some("adj_close")
    else if (adjCloseVariants.exists(v => c.endsWith(" " + v))) Some("adj_close")
    else {
      val last = c.split("\\s+").last
      if (requiredCols.contains(last)) Some(last) else None
    }
  }

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
    // first resolution wins per canonical target (probe order = column
    // order of the incoming frame, like the reference's variant loop)
    val byTarget: Map[String, String] = df.columns.toSeq
      .flatMap(n => canonical(n).map(_ -> n))
      .groupBy(_._1).map { case (t, xs) => t -> xs.head._2 }
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
