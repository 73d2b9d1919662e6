package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants + plan pins for the round-5 curation operators.
  * (Exact values are the oracle gate's job; these hold the properties
  * that must survive ANY corpus.) */
class PipelineSpec extends SparkSpec {

  test("q_pack_sequences conserves docs and bounds every bin by budget + max doc") {
    val d = sf("sf0.001")
    val bins = Pipeline.qPackSequences(spark, d).collect()
    val nDocs = bins.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == 500, s"packing lost/duplicated docs: $nDocs")
    // bins are the consecutive prefix cells 0..B-1
    val ids = bins.map(_.getAs[Long]("bin")).sorted
    assert(ids.head == 0 && ids.last == ids.length - 1,
      s"non-contiguous bins: ${ids.mkString(",")}")
    // a bin holds the docs whose prefix-start lands inside one
    // 2048-token cell, so its total is < budget + one max-size doc
    val maxDoc = 100
    bins.foreach { r =>
      assert(r.getAs[Long]("sum_tok") < 2048 + maxDoc,
        s"bin ${r.getAs[Long]("bin")} overfull: ${r.getAs[Long]("sum_tok")}")
    }
    // doc ranges must not overlap across bins (contiguous packing)
    val ranges = bins.sortBy(_.getAs[Long]("bin"))
      .map(r => (r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc")))
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, "bin ranges overlap")
      case _ =>
    }
  }

  test("q_pack_sequences plans without a global (empty-partition) window") {
    val df = Pipeline.qPackSequences(spark, sf("sf0.001"))
    val globals = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty, "packing fell back to a single-partition window")
  }

  test("q_text_blocklist scrubs every denylist token and plans Generate-free") {
    val df = Pipeline.qTextBlocklist(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Generate"), s"blocklist explodes rows:\n$p")
    // re-derive the scrub independently and compare the md5s
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Pipeline.qTextBlocklist(spark, sf("sf0.001")).collect().foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ")
      val clean = toks.filterNot(t => t == "slow" || t == "big").mkString(" ")
      assert(!clean.split(" ").exists(t => t == "slow" || t == "big"))
      assert(r.getAs[Long]("n_hits") ==
        toks.count(t => t == "slow" || t == "big").toLong)
      assert(r.getAs[Int]("clean_len") == clean.length)
    }
  }

  test("q_text_tfidf emits at most 3 ranked rows per doc, scores non-increasing") {
    val rows = Pipeline.qTextTfidf(spark, sf("sf0.001"))
      .collect().groupBy(_.getAs[Long]("doc_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (id, rs) =>
      assert(rs.length <= 3, s"doc $id has ${rs.length} rows")
      val byRk = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRk.map(_.getAs[Int]("rk")).toSeq == (1 to rs.length),
        s"doc $id ranks not 1..k")
      val scores = byRk.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $id scores increase: ${scores.mkString(",")}")
    }
  }

  test("q_text_repetition ratios stay in range and distinct <= total") {
    Pipeline.qTextRepetition(spark, sf("sf0.001")).collect().foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nDis = r.getAs[Long]("n_distinct")
      assert(nDis >= 1 && nDis <= nTok)
      val dup = r.getAs[Double]("dup_ratio")
      assert(dup >= 0.0 && dup < 1.0)
      val tb = r.getAs[Double]("top_bigram_frac")
      assert(tb > 0.0 && tb <= 1.0)
    }
  }

  test("q_dedup_ngram_spans only reports cross-doc spans, hashes not text") {
    val df = Pipeline.qDedupNgramSpans(spark, sf("sf0.001"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2)
      assert(r.getAs[Long]("n_occ") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[String]("h").length == 16, "span shuffled as text?")
      assert(r.getAs[Long]("min_doc") < r.getAs[Long]("max_doc"))
    }
    // near-dup docs (minhash pairs at J>=0.8) share long runs, so every
    // such pair must be bracketed by at least one repeated span (the
    // bracket can widen past the pair when a third copy exists)
    val brackets = rows.map(r =>
      (r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc")))
    val lsh = Llm.qDedupMinhashLsh(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    assert(lsh.forall { case (a, b) =>
      brackets.exists { case (lo, hi) => lo <= a && b <= hi }
    }, "an exact near-dup pair is bracketed by no repeated 8-gram span")
  }

  test("graft_text_rep kernel equals brute force on random and degenerate texts") {
    import graft.expressions.TextRep
    val rnd = new scala.util.Random(77)
    val vocab = Array("a", "bb", "ccc", "dd", "e")
    val cases = Seq("", "solo", "a a", "x  y", " lead", "trail ") ++
      (1 to 50).map(_ => Seq.fill(1 + rnd.nextInt(40))(
        vocab(rnd.nextInt(vocab.length))).mkString(" "))
    cases.foreach { text =>
      val r = TextRep.rep(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val tk = text.split(" ", -1)
      val real = tk.filter(_.nonEmpty)
      assert(r.getLong(0) == real.length.toLong, s"n_tokens for '$text'")
      assert(r.getLong(1) == real.distinct.length.toLong, s"n_distinct for '$text'")
      val bigrams = tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val top = if (bigrams.isEmpty) 0L
        else bigrams.groupBy(identity).values.map(_.size).max.toLong
      assert(r.getLong(2) == top, s"top_bigram_n for '$text'")
      assert(r.getLong(3) == math.max(tk.length - 1, 0).toLong, s"n_bigrams for '$text'")
    }
  }

  test("q_join_skew_salted never plans a cartesian product") {
    val df = Joins.qJoinSkewSalted(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"salted join went cartesian:\n$p")
  }

  test("q_sim_maxsim matches an exact-decimal driver brute force") {
    val dir = sf("sf0.001")
    val got = Llm.qSimMaxsim(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def q6(x: Float): BigDecimal =
      BigDecimal(x.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def dot(a: Array[Float], b: Array[Float]): BigDecimal =
      a.zip(b).map { case (x, y) => q6(x) * q6(y) }.sum
    val query = (0L to 3L).map(vecs)
    val passages = vecs.keys.groupBy(_ / 4)
    assert(got.size == passages.size, "one score per passage")
    passages.foreach { case (p, members) =>
      val want = query.map { qt =>
        members.map(v => dot(qt, vecs(v))).max
      }.sum.toDouble
      assert(got(p) == want, s"passage $p: got ${got(p)} want $want")
    }
    // the query passage contains its own tokens, so its score is at
    // least its self-similarity
    val self = query.map(qt => dot(qt, qt)).sum.toDouble
    assert(got(0L) >= self, "query passage under-scores itself")
  }

  test("q_pipeline_e2e: manifest is a gated, deduped, contiguous permutation") {
    val dir = sf("sf0.001")
    val rows = Pipeline.qPipelineE2e(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
    assert(rows.nonEmpty, "empty manifest")
    // positions are exactly 1..N (contiguous permutation, no gaps)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    // every surviving doc passes the gate (independent recomputation)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (_, d, _, nTok) =>
      val text = docs(d)
      val tk = text.split(" ", -1)
      assert(tk.length == nTok, s"doc $d n_tok mismatch")
      val charSum = text.length - tk.length + 1
      val nStop = tk.count(Set("the", "a", "data"))
      assert(tk.length >= 20 && tk.length <= 80, s"doc $d fails token gate")
      assert(charSum >= tk.length * 4 && charSum * 4 <= tk.length * 19,
        s"doc $d fails length gate")
      assert(nStop * 25 <= tk.length * 3, s"doc $d fails stopword gate")
    }
    // no two survivors share content
    val texts = rows.map(r => docs(r._2))
    assert(texts.distinct.length == texts.length,
      "duplicate content survived the dedup stage")
    // the mix rule held (LCG membership)
    rows.foreach { case (_, d, src, _) =>
      val w4 = src.drop(3).toInt % 4 + 1
      val bucket = java.lang.Long.remainderUnsigned(d * 2654435761L,
        4294967296L) % 4
      assert(bucket < w4, s"doc $d from $src fails the mix rule")
    }
  }

  test("q_text_perplexity_gate: LM is a sub-distribution, gate splits corpus") {
    val dir = sf("sf0.001")
    val rows = Pipeline.qTextPerplexityGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // every >=2-token doc gets a verdict
    val nDocs = graft.Tables.documents(spark, dir)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length === nDocs)
    rows.foreach { case (d, nb, avg, keep) =>
      assert(nb >= 1, s"doc $d: no bigrams")
      assert(avg >= 0 && avg <= 1000000, s"doc $d: avg_p_ppm $avg out of range")
      assert(keep == (if (avg >= 34500) 1 else 0), s"doc $d: keep flag wrong")
    }
    // the threshold sits at the corpus median: both sides populated
    assert(rows.exists(_._4 == 1) && rows.exists(_._4 == 0),
      "gate did not split the corpus")
    // floor-division probabilities per w1 sum to at most 1e6 ppm
    val pairs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1)," +
          " i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"))
        .as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val overs = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .join(pairs.groupBy(col("w1").as("u1")).agg(count(lit(1)).as("n_w1")),
        col("w1") === col("u1"))
      .select(col("w1"), expr("n * 1000000L div n_w1").as("p_ppm"))
      .groupBy("w1").agg(sum(col("p_ppm")).as("tot"))
      .filter(col("tot") > 1000000L).count()
    assert(overs == 0, "some w1's conditional probabilities exceed 1e6 ppm")
  }

  test("q_dedup_span_mask: coverage bounded, consistent with span discovery") {
    val dir = sf("sf0.001")
    val rows = Pipeline.qDedupSpanMask(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.length === nDocs, "one verdict per doc, incl. uncovered")
    rows.foreach { case (d, nt, nc, nr) =>
      assert(nc >= 0 && nc <= nt, s"doc $d coverage $nc outside [0, $nt]")
      assert(nr === nt - nc, s"doc $d retained mismatch")
    }
    // every doc that the discovery pass names as hosting a cross-doc
    // repeated span must have at least one 8-token interval covered
    val byDoc = rows.map(r => r._1 -> r._3).toMap
    val hosts = Pipeline.qDedupNgramSpans(spark, dir).collect()
      .flatMap(r => Seq(r.getLong(3), r.getLong(4))).toSet
    hosts.foreach { d =>
      assert(byDoc(d) >= 8, s"span-hosting doc $d covers only ${byDoc(d)} tokens")
    }
  }
}
