package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Catalog registration: the whole table surface must be reachable from
  * plain spark.sql through registered names (the reference registers
  * every lake layer as Athena external tables). */
class CatalogSpec extends SparkSpecBase {

  test("register exposes every base table to spark.sql") {
    Tables.register(spark, sfDir)
    Tables.Names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM graft.$n").count() > 0, s"table $n empty")
    }
  }

  test("SQL over registered tables matches the DataFrame API result") {
    Tables.register(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT r_name, COUNT(*) AS n FROM graft.customer c
        |JOIN graft.nation n ON c.c_nationkey = n.n_nationkey
        |JOIN graft.region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaApi = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql === viaApi)
  }

  test("events_ts view serves a real timestamp and agrees with Tables.events") {
    Tables.register(spark, sfDir)
    val view = spark.sql("SELECT ts FROM graft.events_ts")
    assert(view.schema("ts").dataType === TimestampType)
    val sqlMax = spark.sql("SELECT CAST(max(ts) AS LONG) FROM graft.events_ts").head().getLong(0)
    val apiMax = Tables.events(spark, sfDir)
      .agg(max(col("ts").cast("long"))).head().getLong(0)
    assert(sqlMax === apiMax)
  }

  // The testdata generator has flipped the physical `ts` encoding between
  // rounds (TIMESTAMP(NANOS)→long vs timestamp[us]→TIMESTAMP_NTZ). Both
  // must normalize to TimestampType through Tables.events AND the
  // events_ts view, so the next flip can't re-break the contract. Each
  // fixture dir symlinks the other nine tables and rewrites events with
  // the target encoding.
  private def fixtureDir(encode: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-events-enc").toString
    Tables.Names.filterNot(_ == "events").foreach { n =>
      Files.createSymbolicLink(
        Paths.get(s"$dir/$n.parquet"), Paths.get(s"$sfDir/$n.parquet"))
    }
    encode(Tables.events(spark, sfDir))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events ts normalizes to TimestampType under BOTH physical encodings") {
    val truth = Tables.events(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val fixtures = Seq(
      // micros-NTZ: what the current generator writes
      "ntz" -> fixtureDir(df => df.withColumn("ts", col("ts").cast("timestamp_ntz"))),
      // nanos-as-long: what the old generator's TIMESTAMP(NANOS) read as
      "long" -> fixtureDir(df => df.withColumn("ts", expr("unix_micros(ts) * 1000L"))))
    try fixtures.foreach { case (enc, dir) =>
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType === TimestampType, s"encoding $enc via Tables.events")
      assert(ev.agg(max(unix_micros(col("ts")))).head().getLong(0) === truth,
        s"encoding $enc drifted the instant")
      Tables.register(spark, dir)
      val view = spark.sql("SELECT ts FROM graft.events_ts")
      assert(view.schema("ts").dataType === TimestampType, s"encoding $enc via events_ts")
      assert(spark.sql("SELECT max(unix_micros(ts)) FROM graft.events_ts")
        .head().getLong(0) === truth, s"encoding $enc drifted through the view")
    }
    // finally, not tail: a failed assertion must not leave the shared
    // session's catalog pointed at the temp fixture for every later suite
    finally Tables.register(spark, sfDir)
  }

  test("StateStore.register serves versioned snapshots through SQL with isolation") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cat-state").toString
    graft.sources.StateStore.merge(spark, root, "2024-01-01",
      Seq(("a", 1.0), ("b", 2.0)).toDF("entity", "dist"),
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = 4)
    graft.sources.StateStore.merge(spark, root, "2024-01-02",
      Seq(("a", 10.0), ("c", 5.0)).toDF("entity", "dist"),
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = 4)
    graft.sources.StateStore.register(spark, root, "voyage_state")
    def m(view: String) = spark.sql(s"SELECT entity, dist FROM $view")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // day-1 snapshot: the pre-merge state
    assert(m("voyage_state_v_2024_01_01") === Map("a" -> 1.0, "b" -> 2.0))
    // day-2 snapshot = current: merged sums + the new key
    assert(m("voyage_state_v_2024_01_02") === Map("a" -> 11.0, "b" -> 2.0, "c" -> 5.0))
    assert(m("voyage_state") === m("voyage_state_v_2024_01_02"))
    // snapshot ISOLATION: a merge committed after registration must not
    // bleed into the already-registered views
    graft.sources.StateStore.merge(spark, root, "2024-01-03",
      Seq(("a", 100.0)).toDF("entity", "dist"),
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = 4)
    assert(m("voyage_state")("a") === 11.0,
      "post-registration merge bled into the registered current view")
    // re-registration sees it
    graft.sources.StateStore.register(spark, root, "voyage_state")
    assert(m("voyage_state")("a") === 111.0)
    assert(m("voyage_state_v_2024_01_01") === Map("a" -> 1.0, "b" -> 2.0))
  }

  test("re-registration is idempotent and re-points at the new location") {
    Tables.register(spark, sfDir)
    val n1 = spark.sql("SELECT COUNT(*) FROM graft.lineitem").head().getLong(0)
    Tables.register(spark, sfDir) // same dir again: no failure, same counts
    assert(spark.sql("SELECT COUNT(*) FROM graft.lineitem").head().getLong(0) === n1)
    // different dir: the registration must win
    Tables.register(spark, "/root/testdata/sf0.01")
    val n2 = spark.sql("SELECT COUNT(*) FROM graft.lineitem").head().getLong(0)
    assert(n2 > n1, s"expected sf0.01 row count > sf0.001 ($n2 vs $n1)")
    Tables.register(spark, sfDir) // restore for other suites
  }

  test("the whole hybrid retrieval stack runs as ONE plain-SQL query") {
    // BM25 + dense cosine + RRF are ranking SHAPES, not registrable
    // scalar functions (see GraftFunctions' registry note) — the SQL
    // surface claim is that the FULL stack is expressible as a single
    // spark.sql statement over the registered catalog tables, with the
    // registered dot_product kernel carrying the dense side. Asserted
    // equal to the operator pipeline (q_rrf_hybrid's exact recipe).
    Tables.register(spark, sfDir)
    val viaSql = spark.sql(
      """WITH toks AS (
        |  SELECT doc_id AS id, explode(split(text, ' ')) AS token
        |  FROM graft.documents
        |), tf AS (
        |  SELECT id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        |), tf2 AS (
        |  SELECT *, SUM(tf) OVER (PARTITION BY id) AS dl FROM tf
        |), dfreq AS (
        |  SELECT token, COUNT(DISTINCT id) AS df FROM toks GROUP BY 1
        |), stats AS (
        |  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl
        |  FROM (SELECT id, COUNT(*) AS dl FROM toks GROUP BY 1)
        |), qt AS (
        |  SELECT DISTINCT doc_id AS query_id,
        |         explode(split(text, ' ')) AS token
        |  FROM graft.documents WHERE doc_id < 5
        |), scored AS (
        |  SELECT query_id, id,
        |         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2
        |           / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS w
        |  FROM tf2 JOIN dfreq USING (token) JOIN qt USING (token)
        |       CROSS JOIN stats
        |  WHERE query_id <> id
        |), sparse AS (
        |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
        |           ORDER BY bm25 DESC, doc_id ASC) AS rank
        |  FROM (SELECT query_id, id AS doc_id,
        |          floor(SUM(w)*1000 + 0.5)/1000 AS bm25
        |        FROM scored GROUP BY 1, 2)
        |), cosed AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
        |         dot_product(q.embedding, c.embedding) /
        |           (sqrt(dot_product(q.embedding, q.embedding)) *
        |            sqrt(dot_product(c.embedding, c.embedding))) AS cos
        |  FROM graft.embeddings c JOIN graft.embeddings q
        |    ON q.vec_id < 5 AND q.vec_id <> c.vec_id
        |), dense AS (
        |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
        |           ORDER BY cos DESC, doc_id ASC) AS rank
        |  FROM cosed
        |), unioned AS (
        |  SELECT * FROM sparse WHERE rank <= 20
        |  UNION ALL SELECT * FROM dense WHERE rank <= 20
        |), fused AS (
        |  SELECT query_id, doc_id, SUM(1.0d/(60 + rank)) AS rrf,
        |         COUNT(*) AS n_lists
        |  FROM unioned GROUP BY 1, 2
        |)
        |SELECT query_id, doc_id, floor(rrf*1000 + 0.5)/1000 AS rrf,
        |       n_lists, rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY rrf DESC, doc_id ASC) AS rank FROM fused)
        |WHERE rank <= 10""".stripMargin)
      .collect().map(_.toSeq).toSet
    val viaOps = CacheScope.scoped {
      SparkEntry.queries("q_rrf_hybrid")(spark, sfDir)
        .collect().map(_.toSeq).toSet
    }
    assert(viaSql === viaOps,
      s"sql-only: ${(viaSql -- viaOps).take(3)}; ops-only: ${(viaOps -- viaSql).take(3)}")
    assert(viaSql.nonEmpty)
  }

  test("the sketch-store rollup algebra is reachable from plain SQL (kmv + kll + hll)") {
    Tables.register(spark, sfDir)
    // per-day sketch rows built in SQL, then merged to months in SQL —
    // the registered kmv/kll kernels next to Spark's own hll pair
    val rolled = spark.sql(
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |         hll_sketch_agg(user_id, 12) AS hll,
        |         kll_sketch_agg(value, 200) AS kll,
        |         kmv_sketch_agg(md5(CAST(user_id AS STRING)), 512) AS kmv
        |  FROM graft.events_ts GROUP BY 1
        |)
        |SELECT CAST(date_trunc('month', day) AS DATE) AS month,
        |       hll_sketch_estimate(hll_union_agg(hll, false)) AS hll_est,
        |       kll_quantile(kll_merge_agg(kll, 200), 0.5d) AS p50_est,
        |       size(kmv_merge_agg(kmv, 512)) AS kmv_size
        |FROM daily GROUP BY 1""".stripMargin).collect()
    assert(rolled.nonEmpty)
    val exact = spark.sql(
      """SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
        |       COUNT(DISTINCT user_id) AS n,
        |       percentile(value, 0.45) AS lo, percentile(value, 0.55) AS hi
        |FROM graft.events_ts GROUP BY 1""".stripMargin)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    rolled.foreach { r =>
      val (n, lo, hi) = exact(r.getDate(0).toString)
      assert(math.abs(r.getLong(1) - n) <= math.max(n * 0.05, 1.0),
        s"hll drifted: $r vs exact $n")
      assert(r.getDouble(2) >= lo && r.getDouble(2) <= hi,
        s"kll p50 outside rank band [$lo, $hi]: $r")
      assert(r.getInt(3) > 0 && r.getInt(3) <= 512, s"kmv size: $r")
    }
  }
  test("round-11 kernels are SQL-registered: hashed_shingles, cdc_boundaries, quantile_bucket") {
    // hashed_shingles values ARE xxhash64 of the shingle strings
    val hs = spark.sql(
      "SELECT hashed_shingles('a b c d', 3) AS hs, " +
        "array(xxhash64('a b c'), xxhash64('b c d')) AS want").head()
    assert(hs.getSeq[Long](0).toSet === hs.getSeq[Long](1).toSet)
    // SQL name ≡ the Column-API kernel on the same text/config
    val txt = "the quick brown fox jumps over the lazy dog, twice over"
    val viaSql = spark.sql(
      s"SELECT cdc_boundaries('$txt', 4, 8) AS b, " +
        s"cdc_boundaries('$txt') AS bdef").head()
    val viaApi = spark.range(1).select(
      graft.functions.Hashing.cdcBoundaries(
        org.apache.spark.sql.functions.lit(txt), 4, 31L, 1000003L, 8).as("b"),
      graft.functions.Hashing.cdcBoundaries(
        org.apache.spark.sql.functions.lit(txt), 16, 31L, 1000003L, 64).as("bdef")).head()
    assert(viaSql.getSeq[Int](0) === viaApi.getSeq[Int](0))
    assert(viaSql.getSeq[Int](1) === viaApi.getSeq[Int](1))
    // quantile_bucket counts cuts at-or-below the value; NaN → top bucket
    val qb = spark.sql(
      "SELECT quantile_bucket(CAST(2.5 AS DOUBLE), array(1.0D, 2.0D, 3.0D)) AS b1, " +
        "quantile_bucket(CAST(0.0 AS DOUBLE), array(1.0D, 2.0D, 3.0D)) AS b0, " +
        "quantile_bucket(CAST('NaN' AS DOUBLE), array(1.0D, 2.0D, 3.0D)) AS bn").head()
    assert(qb.getLong(0) === 2L)
    assert(qb.getLong(1) === 0L)
    assert(qb.getLong(2) === 3L)
  }
}
