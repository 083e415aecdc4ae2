package graft

import org.apache.spark.sql.functions._
import graft.operators.Indicators

/** pandas-parity goldens for the EWM family (SURVEY.md §2.5 W4-W7).
  * Golden values generated with pandas 2.2.2 from the literal reference
  * formulas (/root/reference/analyze_visualize.py:111-117):
  * s.ewm(span=n).mean() (adjust=True default), macd = ema12 - ema26,
  * signal = macd.ewm(span=9).mean().
  */
class EwmSpec extends SparkSpec {

  val closes = Seq(10.0, 11.0, 9.0, 12.0, 13.0, 12.5, 11.0, 14.0, 15.5, 15.0,
    16.0, 14.5, 13.0, 15.0, 16.5, 17.0, 16.0, 18.0, 19.0, 18.5)

  val ema12 = Seq(10.0, 10.541666666666666, 9.939953810623557, 10.590229885057472, 11.244955812825221, 11.549997577938026, 11.427267542715846, 11.96415715275261, 12.663672719101017, 13.10640583083086, 13.635863794305465, 13.789504374840138, 13.652416422504846, 13.881866879823392, 14.320448998327846, 14.76326592842114, 14.965339970298098, 15.456493928610618, 16.02545088903411, 16.42012155982985)
  val ema26 = Seq(10.0, 10.519230769230768, 9.973385904386397, 10.539938643335985, 11.110437018712794, 11.388755401107865, 11.31961726827541, 11.751493341752733, 12.307104319235611, 12.678697714067907, 13.109471672743375, 13.280319987483441, 13.247480551512071, 13.444309341902041, 13.774860220652812, 14.112236335463395, 14.303860833006976, 14.66903286622375, 15.08660076654571, 15.408510258696236)
  val macd = Seq(0.0, 0.0224358974358978, -0.03343209376284051, 0.05029124172148691, 0.1345187941124273, 0.16124217683016084, 0.10765027444043618, 0.21266381099987797, 0.3565683998654059, 0.42770811676295395, 0.5263921215620897, 0.5091843873566972, 0.40493587099277484, 0.4375575379213501, 0.5455887776750341, 0.6510295929577445, 0.6614791372911224, 0.7874610623868676, 0.938850122488402, 1.011611301133616)
  val macdSignal = Seq(0.0, 0.012464387464387666, -0.006345645825459945, 0.01284029169044346, 0.04903689521911546, 0.0794507650286841, 0.08658730856634346, 0.11688586297027556, 0.1722537180642478, 0.22949033248025147, 0.29445074745351413, 0.34056652772358215, 0.35418931714605856, 0.3716300111345919, 0.4076905311983193, 0.4577678960610511, 0.4994487128621347, 0.5581078926072491, 0.6353698000151993, 0.7114957729514559)

  test("ewm(span=3) matches pandas adjust=True on the worked example") {
    val df = Indicators.withEmaMacd(bars("A", Seq(10, 11, 9, 12, 13)))
    // FIXTURES.md §B case 1: [10, 10.6667, 9.7143, 10.9333, 12.0] for span 3
    val expected = Seq(10.0, 10.666666666666666, 9.714285714285714,
      10.933333333333334, 12.0)
    val span3 = bars("A", Seq(10, 11, 9, 12, 13))
      .withColumn("e3", graft.functions.EwmMean.ewm(col("close"), 3)
        .over(Indicators.w.rowsBetween(Long.MinValue, 0)))
    assertColumn(span3, "e3", expected)
  }

  test("ema_12/ema_26/macd/macd_signal match pandas over 20 rows") {
    val df = Indicators.withEmaMacd(bars("A", closes))
    assertColumn(df, "ema_12", ema12)
    assertColumn(df, "ema_26", ema26)
    assertColumn(df, "macd", macd)
    assertColumn(df, "macd_signal", macdSignal)
  }

  test("grouping (non-window) use fails loudly, never an order-dependent number") {
    val df = bars("A", Seq(10, 11, 9, 12, 13))
    val e = intercept[Throwable] {
      df.groupBy("symbol")
        .agg(graft.functions.EwmMean.ewm(col("close"), 3).as("e"))
        .collect()
    }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("order-sensitive"), messages)
  }

  test("EWM does not leak across symbol partitions") {
    val df = Indicators.withEmaMacd(
      bars("A", closes).unionByName(bars("B", closes.reverse)))
    assertColumn(df.filter(col("symbol") === "A"), "ema_12", ema12)
    // B's first output must equal B's first input, not continue from A
    val bFirst = df.filter(col("symbol") === "B").orderBy("date")
      .select("ema_12").head.getDouble(0)
    assert(math.abs(bFirst - closes.reverse.head) < 1e-12)
  }
}
