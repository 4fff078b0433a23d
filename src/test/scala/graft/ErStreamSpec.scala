package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution
import graft.streaming.ErStream

/** Streaming entity resolution: per-batch registry adoption + intra-batch
  * resolution, exactly-once replay, and batch-ER parity on
  * transitivity-free input. */
class ErStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val str = Seq("name" -> 0.7)
  private val num = Seq(("bal", 0.3, 100.0))

  private def b1 = Seq(
    (1L, "jon smith", "NY", 100.0),
    (2L, "john smith", "NY", 105.0),
    (4L, "maria gonzalez", "CA", 500.0)
  ).toDF("id", "name", "state", "bal")

  private def b2 = Seq(
    (10L, "john smyth", "NY", 108.0),
    (11L, "new person", "NY", 9000.0)
  ).toDF("id", "name", "state", "bal")

  private def process(df: org.apache.spark.sql.DataFrame, id: Long,
                      root: String): Unit =
    ErStream.processBatch(df, id, root, "id", Seq("state"), 0.75,
      str, Seq.empty, num, maxBlock = 100, maxIter = 10)

  test("stream: intra-batch resolution, registry adoption, replay no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-er-stream").toString
    process(b1, 1L, root)
    val r1 = ErStream.registry(spark, root)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    assert(r1 === Map(1L -> 1L, 2L -> 1L, 4L -> 4L),
      "batch 1 must resolve its own typo pair and leave maria alone")

    process(b2, 2L, root)
    val r2 = ErStream.registry(spark, root)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    assert(r2(10L) === 1L, "the batch-2 typo must ADOPT the registry entity")
    assert(r2(11L) === 11L, "no match → own entity")
    assert(r2.size === 5)

    // replay of a committed batch is a verbatim no-op
    process(b2, 2L, root)
    val r3 = ErStream.registry(spark, root)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    assert(r3 === r2)
  }

  test("stream ≡ batch ER on transitivity-free input") {
    val root = java.nio.file.Files.createTempDirectory("graft-er-parity").toString
    process(b1, 1L, root)
    process(b2, 2L, root)
    val stream = ErStream.registry(spark, root)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    val all = b1.unionByName(b2)
    val pairs = EntityResolution.matches(all,
      EntityResolution.blockCandidates(all, "id", Seq("state"), 100),
      "id", 0.75, str, Seq.empty, num)
    val batch = EntityResolution.entities(all, pairs.select("id_a", "id_b"), "id")
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    assert(stream === batch)
  }

  test("crashed attempt (no marker) is discarded and re-resolved cleanly") {
    val root = java.nio.file.Files.createTempDirectory("graft-er-crash").toString
    process(b1, 1L, root)
    // simulate a crash: batch dir exists, marker missing
    val crashed = new java.io.File(s"$root/b=000000000002/records")
    crashed.mkdirs()
    new java.io.File(crashed, "part-junk.parquet").createNewFile()
    process(b2, 2L, root)
    val r = ErStream.registry(spark, root)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    assert(r(10L) === 1L && r(11L) === 11L && r.size === 5)
  }

  test("null block keys and oversized blocks become their own entities") {
    val root = java.nio.file.Files.createTempDirectory("graft-er-nullkey").toString
    val weird = Seq(
      (20L, "a name", null.asInstanceOf[String], 1.0),
      (21L, "a name", null.asInstanceOf[String], 1.0)
    ).toDF("id", "name", "state", "bal")
    process(weird, 1L, root)
    val r = ErStream.registry(spark, root)
      .select("id", "entity_id").as[(Long, Long)].collect().toMap
    assert(r === Map(20L -> 20L, 21L -> 21L),
      "null keys are evidence of nothing — no pairing, own entities")
  }
}
