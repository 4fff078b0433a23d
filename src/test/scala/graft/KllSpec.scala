package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** KLL quantile-sketch rollup: merged day sketches must answer month
 * quantiles inside the rank-error band, including under merge. */
class KllSpec extends SparkSpecBase {

  private lazy val days = {
    // 3 "days" x 30k values each; day d is uniform on [1000·d, 1000·d+999]
    // so the month distribution is a 3-step mixture a single day cannot
    // answer — merged sketches must see all three strata
    spark.range(90000).select(
      (col("id") % 3).as("d"),
      to_timestamp(concat(lit("2024-03-0"), (col("id") % 3 + 1)))
        .as("ts"),
      (col("id") % 3 * 1000 + pmod(hash(col("id")), lit(1000)))
        .cast("double").as("v"))
  }

  test("rolled month quantiles sit in the exact rank band") {
    val out = Quality.quantileRollup(days, "ts", "v",
      qs = Seq(0.5, 0.95), k = 200, eps = 0.02).head()
    assert(out.getBoolean(out.fieldIndex("p50_ok")), s"p50 out of band: $out")
    assert(out.getBoolean(out.fieldIndex("p95_ok")), s"p95 out of band: $out")
    // the exact p50 of the 3-step mixture is ~1500 (middle of stratum 1)
    val p50 = out.getDouble(out.fieldIndex("p50_exact"))
    assert(p50 > 1300 && p50 < 1700, s"fixture broke: p50=$p50")
  }

  test("per-dim groups roll up independently (null dim survives)") {
    val dimmed = days.withColumn("g",
      when(col("d") === 0, lit(null).cast("string"))
        .otherwise(concat(lit("g"), col("d"))))
    val rows = Quality.quantileRollup(dimmed, "ts", "v",
      dims = Seq("g"), qs = Seq(0.5), k = 200, eps = 0.02).collect()
    assert(rows.length === 3, s"expected 3 dim groups, got ${rows.toSeq}")
    assert(rows.exists(_.isNullAt(1)), "null dim group dropped")
    rows.foreach(r => assert(r.getBoolean(r.fieldIndex("p50_ok")),
      s"group out of band: $r"))
  }

  test("KLL trio is SQL-callable: sketch, re-aggregate, probe") {
    GraftFunctions.register(spark)
    days.createOrReplaceTempView("kll_days")
    val row = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(sk), 0.5) AS p50,
        |       kll_quantile(kll_merge_agg(sk, 200), 0.95) AS p95
        |FROM (SELECT kll_sketch_agg(v) AS sk FROM kll_days GROUP BY d)
        |""".stripMargin).head()
    // exact p50 ≈ 1500, p95 ≈ 2850 on the 3-step mixture; the sketch
    // must land within a generous rank band either side
    assert(row.getDouble(0) > 1200 && row.getDouble(0) < 1800, s"sql p50: $row")
    assert(row.getDouble(1) > 2700 && row.getDouble(1) < 3000, s"sql p95: $row")
  }

  test("merge path answers what no single day saw") {
    // day sketches individually cover one stratum; the month p95 (~2950)
    // exists only in stratum 2 — a broken merge (e.g. keeping one day's
    // sketch) lands far outside the band and flips the gate
    val out = Quality.quantileRollup(days, "ts", "v",
      qs = Seq(0.95), k = 200, eps = 0.02).head()
    val p95 = out.getDouble(out.fieldIndex("p95_exact"))
    assert(p95 > 2800, s"fixture broke: p95=$p95")
    assert(out.getBoolean(out.fieldIndex("p95_ok")))
  }
}
