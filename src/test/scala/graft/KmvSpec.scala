package graft

import graft.operators.Quality
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV bottom-k distinct sketches: exactness below k, mergeability,
 * and the overlap estimator's accuracy on planted set geometry. */
class KmvSpec extends SparkSpecBase {
  import spark.implicits._

  private def elems(xs: Seq[String]): DataFrame = xs.toDF("e")

  test("kmvSketch is the exact distinct hash set when n < k") {
    val df = elems(Seq("a", "b", "c", "b", "a"))
    val sk = Quality.kmvSketch(df, "e", k = 16).collect().map(_.getString(0))
    val want = df.select(md5(col("e"))).distinct()
      .collect().map(_.getString(0)).sorted
    assert(sk.toSeq === want.toSeq)
  }

  test("kmvSketch keeps exactly the k smallest distinct hashes") {
    val xs = (1 to 500).map(i => s"item_$i")
    // force many partitions so the per-partition TreeSet + global merge
    // path is exercised, and plant cross-partition duplicates
    val df = spark.sparkContext
      .parallelize(xs ++ xs.take(100), numSlices = 13).toDF("e")
    val k = 32
    val sk = Quality.kmvSketch(df, "e", k).collect().map(_.getString(0))
    val want = xs.map(x => org.apache.commons.codec.digest.DigestUtils.md5Hex(x))
      .distinct.sorted.take(k)
    assert(sk.length === k)
    assert(sk.toSeq === want)
  }

  test("kmvMerge of shard sketches equals the direct sketch of the union") {
    val a = (1 to 300).map(i => s"x$i")
    val b = (200 to 500).map(i => s"x$i")
    val k = 64
    val merged = Quality.kmvMerge(Seq(
      Quality.kmvSketch(elems(a), "e", k),
      Quality.kmvSketch(elems(b), "e", k)), k)
      .collect().map(_.getString(0))
    val direct = Quality.kmvSketch(elems(a ++ b), "e", k)
      .collect().map(_.getString(0))
    assert(merged.toSeq === direct.toSeq, "KMV merge is not lossless")
  }

  test("overlap gate: exact values exact, estimates inside tolerance") {
    // planted geometry: |A|=4000, |B|=3000, |A∩B|=1500
    val inter = (1 to 1500).map(i => s"shared_$i")
    val a = inter ++ (1 to 2500).map(i => s"only_a_$i")
    val b = inter ++ (1 to 1500).map(i => s"only_b_$i")
    val row = Quality.kmvOverlapGate(elems(a), elems(b), "e", k = 512).head()
    assert(row.getLong(row.fieldIndex("n_a")) === 4000L)
    assert(row.getLong(row.fieldIndex("n_b")) === 3000L)
    assert(row.getLong(row.fieldIndex("n_inter")) === 1500L)
    assert(row.getLong(row.fieldIndex("n_union")) === 5500L)
    assert(row.getBoolean(row.fieldIndex("union_ok")), s"union gate: $row")
    assert(row.getBoolean(row.fieldIndex("inter_ok")), s"inter gate: $row")
    assert(row.getBoolean(row.fieldIndex("jac_ok")), s"jaccard gate: $row")
    val unionEst = row.getLong(row.fieldIndex("union_est"))
    assert(math.abs(unionEst - 5500L) <= 550, s"union est off: $unionEst")
    // set differences: |A\B|=2500, |B\A|=1500 — same ρ machinery, same
    // error class as the intersection estimate
    val aOnly = row.getLong(row.fieldIndex("a_only_est"))
    val bOnly = row.getLong(row.fieldIndex("b_only_est"))
    assert(math.abs(aOnly - 2500L) <= 500, s"a_only est off: $aOnly")
    assert(math.abs(bOnly - 1500L) <= 400, s"b_only est off: $bOnly")
  }

  test("disjoint corpora estimate zero-ish intersection") {
    val a = (1 to 2000).map(i => s"left_$i")
    val b = (1 to 2000).map(i => s"right_$i")
    val row = Quality.kmvOverlapGate(elems(a), elems(b), "e", k = 256).head()
    assert(row.getLong(row.fieldIndex("n_inter")) === 0L)
    // ρ counts exact sketch-hash triple matches — disjoint sets share no
    // hash (md5 collisions aside), so the estimate is exactly 0
    assert(row.getLong(row.fieldIndex("inter_est")) === 0L)
    assert(row.getBoolean(row.fieldIndex("inter_ok")))
    assert(row.getBoolean(row.fieldIndex("jac_ok")))
  }

  test("identical corpora estimate Jaccard 1.0 and exact union") {
    val a = (1 to 3000).map(i => s"same_$i")
    val row = Quality.kmvOverlapGate(elems(a), elems(a), "e", k = 128).head()
    assert(row.getDouble(row.fieldIndex("jaccard_est")) === 1.0)
    assert(row.getBoolean(row.fieldIndex("union_ok")))
    assert(row.getBoolean(row.fieldIndex("inter_ok")))
  }

  test("below-k union sketch makes every estimate exact") {
    val a = (1 to 40).map(i => s"sa_$i")
    val b = (20 to 60).map(i => s"sb_$i").map(_.replace("sb_", "sa_"))
    val row = Quality.kmvOverlapGate(elems(a), elems(b), "e", k = 512).head()
    assert(row.getLong(row.fieldIndex("union_est")) ===
      row.getLong(row.fieldIndex("n_union")))
    assert(row.getLong(row.fieldIndex("inter_est")) ===
      row.getLong(row.fieldIndex("n_inter")))
  }
}
