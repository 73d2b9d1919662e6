package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The b x r banding knob must buy recall at the 0.7 Jaccard working
  * point: 2 bands x 2 rows (candidate prob 1-(1-J^2)^2) vs the single
  * AND-4 band (J^4), both verified with the same exact kernel, against
  * exact all-pairs ground truth (test-only cartesian on 500 docs). */
class LshBandingSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("da", "db").collect()
      .map(r => (r.get(0).toString.toLong, r.get(1).toString.toLong)).toSet

  test("2x2 banding recall at Jaccard 0.7 beats the AND-4 single band") {
    graft.expressions.ShingleOps.register(spark)
    // this corpus's own near-dups are all J ~ 1 (both schemes catch
    // everything), so manufacture pairs in the 0.7-0.8 gray zone where
    // the banding theory predicts the gap: drop every 20th word of each
    // doc -> shingle Jaccard ~ 0.77 vs the original (candidate prob
    // ~0.35 for AND-4 vs ~0.83 for 2 x 2 bands)
    val base = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val variants = base.select((col("doc_id") + 10000).as("doc_id"),
      expr("array_join(filter(split(text, ' '), (w, i) -> (i + 1) % 20 != 0), ' ')")
        .as("text"))
    val corpus = base.unionByName(variants)
    val docs = corpus
      .select(col("doc_id"), col("text"),
              expr("graft_minhash_sig(text)").getField("sz").as("sz"))
    val a = docs.select(col("doc_id").as("da"), col("text").as("text_a"),
                        col("sz").as("sa"))
    val b = docs.select(col("doc_id").as("db"), col("text").as("text_b"),
                        col("sz").as("sb"))
    val truth = pairs(a.crossJoin(b).filter(col("da") < col("db"))
      .select(col("da"), col("db"), col("sa"), col("sb"),
              expr("graft_shingle_common(text_a, text_b)").as("nc"))
      .filter(col("nc").cast("double")
        / (col("sa") + col("sb") - col("nc")) >= 0.7))
    assert(truth.nonEmpty, "corpus has no true pairs at Jaccard 0.7")

    val single = pairs(Llm.minhashPairsOn(spark, corpus, Seq(0 until 4), 0.7))
    val banded = pairs(Llm.minhashPairsOn(spark, corpus,
      Seq(Seq(0, 1), Seq(2, 3)), 0.7))
    // AND-4 match implies band-1 match: candidates only grow
    assert(single.subsetOf(banded), "banded candidates lost AND-4 pairs")
    val rSingle = truth.intersect(single).size.toDouble / truth.size
    val rBanded = truth.intersect(banded).size.toDouble / truth.size
    info(f"recall@0.7: and4=$rSingle%.3f banded2x2=$rBanded%.3f of ${truth.size} true pairs")
    assert(rBanded > rSingle,
      f"banding did not improve recall: and4=$rSingle%.3f banded=$rBanded%.3f")
  }

  test("hot band buckets are capped: pairs bounded, dropped mass audited") {
    // adversarial all-same-band corpus: 300 identical docs share every
    // minhash, so ONE bucket would emit 300*299/2 = 44850 pairs — the
    // quadratic blow-up a boilerplate-heavy crawl produces. With the
    // cap below the bucket size, the bucket is skipped entirely and
    // the only emitted pair is the well-behaved small bucket's.
    val s = spark
    import s.implicits._
    val hotText = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val dupText = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec"
    val corpus = ((1 to 300).map(i => (i.toLong, hotText)) ++
      Seq((1001L, dupText), (1002L, dupText))).toDF("doc_id", "text")
    val bands = Seq(0 until 4)

    val capped = pairs(Llm.minhashPairsOn(spark, corpus, bands, 0.8,
      maxBandBucket = 100))
    assert(capped === Set((1001L, 1002L)),
      s"capped run must keep only the small bucket's pair: $capped")

    // raising the cap above the bucket re-admits the full pair set
    val uncapped = Llm.minhashPairsOn(spark, corpus, bands, 0.8,
      maxBandBucket = 1000).count()
    assert(uncapped === 300L * 299 / 2 + 1,
      s"uncapped pair count wrong: $uncapped")

    // the audit face reports exactly the skipped bucket and its mass
    val audit = Llm.lshOverCapBuckets(spark, corpus, bands, 100).collect()
    assert(audit.length === 1, s"expected one over-cap bucket: ${audit.toSeq}")
    assert(audit(0).getAs[Long]("bucket_docs") === 300L)
    assert(audit(0).getAs[Long]("pairs_skipped") === 44850L)

    // per-band accounting: two bands over the same corpus -> two rows
    val audit2 = Llm.lshOverCapBuckets(spark, corpus,
      Seq(Seq(0, 1), Seq(2, 3)), 100)
    assert(audit2.count() === 2L)
  }
}
