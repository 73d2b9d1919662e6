package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketed prefix-sum core behind the global-rank queries must
  * equal brute-force prefix sums for any data — duplicates, skew,
  * negative values, and the degenerate all-equal case — and the exact
  * floor division must match BigInt semantics. */
class PrefixSpec extends SparkSpec {

  test("withPrefix equals brute-force prefix sums on random skewed data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // heavy duplicates + a skew cluster near 0 + negatives
    val values = Seq.fill(400)(rnd.nextInt(40) * 0.5 - 5.0) ++
      Seq.fill(100)(0.25) ++ Seq.fill(3)(-99.0)
    val perValue = values.toDF("v")
      .groupBy("v").agg(count(lit(1)).as("n")).withColumn("d", lit(1L))
    for (buckets <- Seq(1, 7, 256)) {
      val got = Prefix.withPrefix(perValue, "v", Seq("n", "d"), buckets)
        .collect()
        .map(r => (r.getAs[Double]("v"),
                   (r.getAs[Long]("n_before"), r.getAs[Long]("d_before"))))
        .toMap
      val sorted = values.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var cn = 0L; var cd = 0L
      sorted.foreach { case (v, n) =>
        assert(got(v) === ((cn, cd)),
          s"buckets=$buckets v=$v expected ($cn,$cd) got ${got(v)}")
        cn += n; cd += 1
      }
      assert(got.size === sorted.size)
    }
  }

  test("withPrefix handles the all-equal-values degenerate case") {
    val s = spark
    import s.implicits._
    val perValue = Seq.fill(5)(1.5).toDF("v")
      .groupBy("v").agg(count(lit(1)).as("n"))
    val row = Prefix.withPrefix(perValue, "v", Seq("n")).collect()
    assert(row.length === 1 && row.head.getAs[Long]("n_before") === 0L)
  }

  test("equi-depth buckets survive a pathological outlier distribution") {
    // 99.95% of distinct keys uniform in (0, 1], one key at 1e12: the
    // old equi-width map (min/max) would land every real row in bucket
    // 0 — 64x the mean — recreating the single-partition regime this
    // engine exists to avoid. Equi-depth boundaries must keep the
    // largest bucket within ~4x the mean AND the prefixes exact.
    val s = spark
    import s.implicits._
    val buckets = 64
    val values = (1 to 2000).map(_ / 2000.0) :+ 1.0e12
    val perValue = values.toDF("v").withColumn("n", lit(1L))
    val bs = Prefix.depthBoundaries(perValue, col("v"), buckets)
    val counts = perValue
      .select(Prefix.bucketOf(col("v"), bs).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    val mean = values.size.toDouble / buckets
    assert(counts.max <= 4 * mean,
      s"max bucket ${counts.max} exceeds 4x mean bucket size $mean")
    val got = Prefix.withPrefix(perValue, "v", Seq("n"), buckets)
      .collect()
      .map(r => r.getAs[Double]("v") -> r.getAs[Long]("n_before")).toMap
    values.sorted.zipWithIndex.foreach { case (v, i) =>
      assert(got(v) === i.toLong, s"prefix wrong at v=$v")
    }
  }

  test("idiv equals BigInt floor division for non-negative operands") {
    val s = spark
    import s.implicits._
    val cases = for (a <- Seq(0L, 1L, 2L, 3L, 7L, 999999999999L, (1L << 52) - 1);
                     b <- Seq(1L, 2L, 3L, 7L, 1000003L)) yield (a, b)
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), Prefix.idiv(col("a"), col("b")).as("q"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) === a / b, s"idiv($a, $b)")
    }
  }
}
