package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 curation operators: invariants the DuckDB oracle can't see
  * (plan shape for the reservoir sample, brute-force parity for the
  * histogram median/MAD engine, quantization bounds, chunk coverage). */
class CurateSpec extends SparkSpec {

  test("q_sample_reservoir plans through TopKPerKey (bounded heaps, no Window)") {
    val df = Curate.qSampleReservoir(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"reservoir sample not heap-planned:\n$p")
    assert(!p.contains("Window"), s"WindowExec survived the rewrite:\n$p")
  }

  test("q_sample_reservoir is deterministic and capped at 20 per lang") {
    val a = Curate.qSampleReservoir(spark, sf("sf0.001")).collect()
    val b = Curate.qSampleReservoir(spark, sf("sf0.001")).collect()
    assert(a.toSeq == b.toSeq, "sample not reproducible")
    val perLang = a.groupBy(_.getString(0)).view.mapValues(_.length)
    perLang.foreach { case (l, n) => assert(n <= 20, s"lang $l has $n > 20") }
  }

  test("q_outlier_mad matches brute-force median/MAD per language") {
    val got = Curate.qOutlierMad(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val raw = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def median(xs: Seq[Long]): Double = {
      val n = xs.length
      (xs((n - 1) / 2) + xs(n / 2)) / 2.0
    }
    raw.foreach { case (lang, xs) =>
      val med = median(xs)
      val mad = median(xs.map(x => math.abs(2 * x - math.round(2 * med)))
        .sorted) / 2.0 // devs kept in doubled units -> halve
      val nOut = xs.count(x => math.abs(x - med) > 3 * mad)
      val (gn, gmed, gmad, gout) = got(lang)
      assert(gn == xs.length, s"$lang n")
      assert(gmed == med, s"$lang median: got $gmed want $med")
      assert(gmad == mad, s"$lang mad: got $gmad want $mad")
      assert(gout == nOut, s"$lang outliers: got $gout want $nOut")
    }
  }

  test("q_embed_quantize: scale positive, |q|<=127, max dim saturates") {
    val rows = Curate.qEmbedQuantize(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, sumAbsQ, nSat) = (r.getLong(1), r.getLong(2), r.getInt(3))
      assert(m > 0, s"vec ${r.getLong(0)}: zero scale")
      assert(sumAbsQ <= 127L * 64, s"vec ${r.getLong(0)}: |q| out of range")
      assert(nSat >= 1, s"vec ${r.getLong(0)}: the max-|v| dim must hit 127")
    }
  }

  test("q_text_chunk covers every token exactly once per doc") {
    val chunks = Curate.qTextChunk(spark, sf("sf0.001"))
      .groupBy("doc_id")
      .agg(sum(col("n_tok_chunk")).as("tok_sum"),
           count(lit(1)).as("n_chunks"),
           max(col("chunk_id")).as("max_cid"))
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val bad = chunks.join(docs, "doc_id")
      .filter(col("tok_sum") =!= col("n_tok") ||
        col("n_chunks") =!= ceil(col("n_tok") / lit(64.0)).cast("long") ||
        col("max_cid") =!= col("n_chunks") - 1)
      .count()
    assert(bad == 0, s"$bad docs with chunk coverage gaps")
  }

  test("q_mix_temperature shares sum to ~1e6 ppm and favor small sources") {
    val rows = Curate.qMixTemperature(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val totPpm = rows.map(_._3).sum
    // floor-division shares: within |sources| ppm below exactly 1e6
    assert(totPpm <= 1000000 && totPpm > 1000000 - rows.length,
      s"shares sum $totPpm")
    // temperature flattening: share ratio strictly below count ratio
    val bySize = rows.sortBy(_._2)
    val (small, big) = (bySize.head, bySize.last)
    if (small._2 < big._2) {
      assert(small._3.toDouble / big._3 > small._2.toDouble / big._2,
        "T=2 mixing must upweight the small source relative to raw counts")
    }
  }

  test("q_corpus_shuffle is an exact permutation in LCG-key order") {
    val rows = Curate.qCorpusShuffle(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.Tables.documents(spark, sf("sf0.001")).count()
    // every doc appears exactly once, positions are exactly 1..N
    assert(rows.length === n)
    assert(rows.map(_._1).toSet === (1L to n).toSet)
    assert(rows.map(_._2).distinct.length === n.toInt)
    // position order IS key order (the bucketed plan must agree with
    // the straightforward global sort it replaces)
    assert(rows.sortBy(_._1).map(_._3).toSeq === rows.map(_._3).sorted.toSeq)
    // and the key really is the Knuth LCG of doc_id
    rows.foreach { case (_, d, k) =>
      assert(k === java.lang.Long.remainderUnsigned(d * 2654435761L, 4294967296L))
    }
  }
}
