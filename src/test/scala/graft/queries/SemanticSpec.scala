package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Substitute correctness for the semantic-curation faces beyond the
  * DuckDB hash gate: brute-force parity for the SemDeDup drop rule and
  * distributional sanity for the DSIR resample (the gate proves
  * hash-exactness; these prove the SEMANTICS do what the papers
  * promise on the fixtures). */
class SemanticSpec extends SparkSpec {

  test("q_dedup_semantic: kept/dropped agrees with a brute-force within-cluster cosine sweep") {
    val dir = sf("sf0.001")
    graft.expressions.VectorOps.register(spark)
    graft.expressions.VecSum6.register(spark)
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cent = Llm.ivfLearnedCentroids(e)
    val asg = Llm.ivfAssign(e, cent)
      .select(col("vec_id"), col("cid"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
                 r.getSeq[Float](2).toArray.map(_.toDouble)))
      .sortBy(_._1)
    // quantize exactly like graft_quant6 / the decimal oracle: each
    // coordinate to 6 decimal places, cosine from the quantized dots
    def q6(x: Double): Double = math.rint(x * 1e6) / 1e6
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => q6(a(i)) * q6(b(i))).sum
    val byCluster = asg.groupBy(_._2)
    val expectDropped = scala.collection.mutable.Set[Long]()
    byCluster.values.foreach { ms =>
      val sorted = ms.sortBy(_._1)
      for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
        val (va, _, xa) = sorted(i)
        val (vb, _, xb) = sorted(j)
        val c = dot(xa, xb) / (math.sqrt(dot(xa, xa)) * math.sqrt(dot(xb, xb)))
        // stay clear of the threshold by more than quantization noise
        if (c >= 0.35 + 1e-9) expectDropped += vb
        assert(math.abs(c - 0.35) > 1e-7,
          s"fixture pair ($va,$vb) sits on the tau boundary — recalibrate")
      }
    }
    val kept = Semantic.qDedupSemantic(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val all = asg.map(_._1).toSet
    assert(kept === (all -- expectDropped),
      "SemDeDup kept set diverges from the brute-force drop rule")
    assert(expectDropped.nonEmpty, "fixture dropped nobody — tau vacuous")
    assert(kept.contains(all.min), "the lowest id can never be dropped")
  }

  test("q_select_dsir: 100-row resample, deterministic, target-enriched, exact-integer scores") {
    val dir = sf("sf0.01")
    val out = Semantic.qSelectDsir(spark, dir).collect()
    assert(out.length === 100)
    val again = Semantic.qSelectDsir(spark, dir).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq,
      "DSIR resample is not run-deterministic")
    // the ESTIMATION property (the thing DSIR claims): target-language
    // documents score strictly higher on average than every other
    // language — asserted on the full scored table, where the signal
    // is not drowned by resample-size hash noise
    val scoreByLang = Semantic.dsirScores(spark, dir)
      .join(graft.Tables.documents(spark, dir).select("doc_id", "lang"),
            "doc_id")
      .groupBy("lang")
      .agg(avg(col("score_ppm")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = scoreByLang.filter(_._1 != "en").values
    assert(others.nonEmpty && scoreByLang("en") > others.max + 10000,
      s"target lang not separated by the importance scores: $scoreByLang")
    // positions are 1..100 and priorities non-decreasing (the
    // bottom-k of a deterministic priority order)
    val pos = out.map(_.getLong(0))
    assert(pos.toSeq === (1L to 100L))
    val prios = out.map(_.getLong(4))
    assert(prios.zip(prios.tail).forall { case (a, b) => a <= b })
  }

  test("q_dedup_semantic: k derives from corpus size by the ~1k-docs/cluster rule") {
    // fixture corpora (500/500/2000 vectors) all land on the oracle's
    // k=8; the knob binds above 8000 vectors and keeps expected cell
    // population ~1000 at any corpus size
    assert(Semantic.semDedupK(500L) === 8)
    assert(Semantic.semDedupK(2000L) === 8)
    assert(Semantic.semDedupK(8000L) === 8)
    assert(Semantic.semDedupK(8001L) === 9)
    assert(Semantic.semDedupK(5_000_000L) === 5000)
    assert(Semantic.semDedupK(100_000_000L) === 100000)
  }

  test("q_dedup_semantic: over-cap cells skip the pair join and are audited, under-cap cells still dedup") {
    val dir = sf("sf0.001")
    graft.expressions.VectorOps.register(spark)
    graft.expressions.VecSum6.register(spark)
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cent = Llm.ivfLearnedCentroids(e)
    val base = Llm.ivfAssign(e, cent)
      .select(col("vec_id"), col("cid"),
              expr("graft_quant6(embedding)").as("q"),
              expr("graft_dot6(embedding, embedding)").as("nrm"))
      .localCheckpoint(true)
    val pops = base.groupBy("cid").agg(count(lit(1)).as("cn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxPop = pops.values.max
    assert(maxPop > 1L, "fixture cells are all singletons — cap untestable")

    // cap = 1: EVERY multi-member cell is over-cap, so the guarded join
    // sees no pairs at all — kept == everything, by construction
    val allKept = Semantic.semDedupKeptFrom(base, maxCell = 1L).count()
    assert(allKept === base.count(),
      "cap=1 must skip every cell's pair stage and drop nobody")
    val audit = Semantic.semanticOverCapCells(base, maxCell = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(audit.map(_._1).toSet === pops.filter(_._2 > 1L).keySet,
      "audit must report exactly the over-cap cells")
    audit.foreach { case (cid, n, skipped) =>
      assert(n === pops(cid))
      assert(skipped === n * (n - 1) / 2,
        s"cell $cid skipped-pair count wrong")
    }

    // cap just under the hottest cell: that cell's members all survive
    // untouched (its pairs were skipped), every other cell dedups
    // exactly as the uncapped contract query does
    val cap = maxPop - 1
    val hotCells = pops.filter(_._2 > cap).keySet
    val contractDropped = {
      val kept = Semantic.semDedupKeptFrom(base).collect().map(_.getLong(0)).toSet
      base.select("vec_id").collect().map(_.getLong(0)).toSet -- kept
    }
    val cappedKept = Semantic.semDedupKeptFrom(base, maxCell = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hotMembers = base.filter(col("cid").isin(hotCells.toSeq: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(hotMembers.subsetOf(cappedKept.keySet),
      "over-cap cell members must never be dropped (their pairs were skipped)")
    val expectKept = base.select("vec_id").collect().map(_.getLong(0)).toSet --
      (contractDropped -- hotMembers)
    assert(cappedKept.keySet === expectKept,
      "under-cap cells must dedup exactly as the uncapped query")
    // default cap is a fixture no-op: guarded contract == audit empty
    assert(Semantic.semanticOverCapCells(base).count() === 0L,
      "default 4096 cap must not trip on fixture cells")
  }

  test("q_select_dsir_hashed: constant-size feature table ranks like the exact vocab") {
    val dir = sf("sf0.01")
    val exact = Semantic.qSelectDsir(spark, dir)
      .collect().map(_.getLong(1)).toSet
    val hashed = Semantic.qSelectDsirHashed(spark, dir)
      .collect().map(_.getLong(1)).toSet
    assert(hashed.size === 100)
    val overlap = (exact intersect hashed).size
    info(s"exact-vs-hashed resample overlap: $overlap/100")
    assert(overlap >= 80,
      s"hashed-feature resample diverged from exact vocab: $overlap/100")
    // the estimation property must survive hashing: target-language
    // docs still score strictly higher on average
    val scoreByLang = Semantic.dsirScoresHashed(spark, dir)
      .join(graft.Tables.documents(spark, dir).select("doc_id", "lang"),
            "doc_id")
      .groupBy("lang")
      .agg(avg(col("score_ppm")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = scoreByLang.filter(_._1 != "en").values
    assert(others.nonEmpty && scoreByLang("en") > others.max + 10000,
      s"hashed scores lost the target-language separation: $scoreByLang")
  }

  test("q_graph_link_predict: cap is a no-op below the degree bound (equals uncapped RA)") {
    val dir = sf("sf0.001") // maxdeg 10 << 64, so capped == uncapped
    val got = Graph.qGraphLinkPredict(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val e = graft.Tables.orders(spark, dir)
      .join(graft.Tables.lineitem(spark, dir),
            col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = e.groupBy(_._1).map { case (c, xs) => c -> xs.length.toLong }
    val byC = e.groupBy(_._1)
    val score = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    byC.foreach { case (c, xs) =>
      val sps = xs.map(_._2).sorted
      for (i <- sps.indices; j <- (i + 1) until sps.length) {
        val k = (sps(i), sps(j))
        val (s0, n0) = score.getOrElse(k, (0L, 0L))
        score(k) = (s0 + 1000000L / deg(c), n0 + 1L)
      }
    }
    val want = score.toSeq
      .map { case ((s1, s2), (sc, n)) => (s1, s2, sc, n) }
      .sortBy { case (s1, s2, sc, _) => (-sc, s1, s2) }
      .take(20)
    assert(got.toSeq === want,
      "capped RA diverges from brute-force uncapped RA under the bound")
  }

  test("q_graph_link_predict: the cap bounds a synthetic hub deterministically") {
    import spark.implicits._
    // one customer connected to 200 suppliers: candidate pairs must be
    // C(64,2), never C(200,2) — the day-one skew guard
    val sps = (1L to 200L)
    val e = sps.map(sp => (1L, sp)).toDF("c", "sp")
    val capped = e
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("c").orderBy("sp")))
      .filter(col("rn") <= Graph.LinkDegCap)
      .select("c", "sp")
    assert(capped.count() === 64L)
    assert(capped.agg(max("sp")).head.getLong(0) === 64L,
      "cap must keep the LOWEST suppkeys (deterministic contract)")
  }

  test("q_win_islands: longest streaks match a brute-force scan") {
    val dir = sf("sf0.001")
    val got = Windows.qWinIslands(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
              unix_micros(col("ts")).as("tsu"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).map { case (u, xs) =>
      val ordered = xs.sortBy(x => (x._4, x._3))
      // runs of equal event_type, in order
      val runs = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
      ordered.foreach { case (_, t, _, tsu) =>
        if (runs.nonEmpty && runs.last._1 == t) {
          val (tt, n, st) = runs.remove(runs.length - 1)
          runs += ((tt, n + 1, st))
        } else runs += ((t, 1L, tsu))
      }
      val best = runs.minBy { case (t, n, st) => (-n, st, t) }
      (u, best._1, best._2, best._3)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === want, "islands diverge from the brute-force runs")
    assert(want.exists(_._3 >= 2L), "fixture has no streak >= 2 — vacuous")
  }
}
