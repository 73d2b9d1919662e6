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

  test("q_sample_weighted: bounded top-k plan, deterministic, PPS bias") {
    val df = Curate.qSampleWeighted(spark, sf("sf0.001"))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly k rows, contiguous positions, priority-sorted
    assert(rows.length == 100)
    assert(rows.map(_._1).toSeq == (1L to 100L))
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    // reproducible
    val again = Curate.qSampleWeighted(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq, "weighted sample not reproducible")
    // PPS: the length-weighted sample must skew heavier than the corpus
    val corpusMeanW = graft.Tables.documents(spark, sf("sf0.001"))
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val sampleMeanW = rows.map(_._3).sum.toDouble / rows.length
    assert(sampleMeanW > corpusMeanW,
      s"PPS sample mean w $sampleMeanW not above corpus mean $corpusMeanW")
    // scale shape: per-partition bounded top-k, not a global sort
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"weighted sample must plan as bounded top-k:\n$p")
  }

  test("q_mix_budget: allocations feasible, proportional, one binding source") {
    val rows = Curate.qMixBudget(spark, sf("sf0.001")).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val wtot = rows.map(_._2).sum
    val budget = rows.head._6
    rows.foreach { case (src, w, avail, alloc, utilPpm, b) =>
      assert(b == budget, s"$src: budget differs across rows")
      assert(alloc <= avail, s"$src: alloc $alloc exceeds avail $avail")
      assert(alloc == budget * w / wtot, s"$src: alloc not proportional")
      assert(utilPpm == alloc * 1000000L / avail, s"$src: util_ppm wrong")
    }
    // the binding source is fully consumed; nothing exceeds full use
    assert(rows.map(_._5).max == 1000000L,
      "no source is fully utilized - budget is not maximal")
    // budget is maximal: adding one more wtot-quantum would overdraw
    // the binding source
    val binding = rows.filter(_._5 == 1000000L).head
    assert((budget + wtot) * binding._2 / wtot > binding._3,
      "budget could be raised without overdrawing the binding source")
  }

  test("q_mix_waterfill: matches a brute-force water-level search") {
    val rows = Curate.qMixWaterfill(spark, sf("sf0.001")).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getInt(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val budget = rows.head._6
    // feasibility: alloc <= avail, capped iff fully consumed
    rows.foreach { case (src, _, avail, alloc, capped, _) =>
      assert(alloc <= avail, s"$src overdrawn")
      assert((capped == 1) == (alloc == avail) || capped == 0,
        s"$src capped flag inconsistent")
    }
    // total within floor slack of the budget (one unit per uncapped src)
    val slack = budget - rows.map(_._4).sum
    assert(slack >= 0 && slack <= rows.count(_._5 == 0),
      s"allocation total off budget by $slack")
    // capped set equals the brute-force continuous water level's
    val w = rows.map(_._2.toDouble)
    val avail = rows.map(_._3.toDouble)
    var (lo, hi) = (0.0, 1e12)
    (1 to 200).foreach { _ =>
      val lam = (lo + hi) / 2
      val tot = avail.zip(w).map { case (a, wi) => math.min(a, lam * wi) }.sum
      if (tot < budget) lo = lam else hi = lam
    }
    rows.zipWithIndex.foreach { case ((src, _, _, _, capped, _), i) =>
      val bfCapped = avail(i) <= lo * w(i) + 1e-6
      assert((capped == 1) == bfCapped,
        s"$src: capped=$capped but water-level says $bfCapped")
    }
    // uncapped allocations are weight-proportional (exact floor rule)
    val un = rows.filter(_._5 == 0)
    if (un.nonEmpty) {
      val ca = rows.filter(_._5 == 1).map(_._3).sum
      val cw = rows.filter(_._5 == 1).map(_._2).sum
      val wtot = rows.map(_._2).sum
      un.foreach { case (src, wi, _, alloc, _, _) =>
        assert(alloc == (budget - ca) * wi / (wtot - cw), s"$src floor rule")
      }
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

  test("q_mix_epoch_upsample matches brute-force fractional replication") {
    val dir = sf("sf0.01") // sf0.001 masses may be too uniform to exercise
    val rows = Curate.qMixEpochUpsample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute-force factor per source from the raw table
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val mass = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val mMax = mass.values.max
    val fppm = mass.view.mapValues(m =>
      math.floor(math.sqrt(mMax.toDouble / m.toDouble) * 1e6).toLong).toMap
    // per-doc expected copy count: floor + hash-fraction extra
    val got = rows.groupBy(_._2).view.mapValues(_.length).toMap
    docs.foreach { case (d, src, _) =>
      val f = fppm(src)
      val frac = java.lang.Long.remainderUnsigned(d * 2654435761L,
        4294967296L) % 1000000L
      val want = f / 1000000L + (if (frac < f % 1000000L) 1L else 0L)
      assert(got(d).toLong == want, s"doc $d: ${got(d)} copies, want $want")
    }
    // the factor column is the source's factor; copy ids are 1..n dense
    rows.groupBy(_._2).foreach { case (d, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq,
        s"doc $d copy ids not dense")
      rs.foreach { case (src, _, f, _) => assert(f == fppm(src)) }
    }
    // non-degeneracy: the corpus must actually exercise replication
    assert(rows.length > docs.length,
      "no doc was upsampled — factor table degenerated to identity")
  }
}
