package graft.queries

import java.io.File

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The Bloom contamination gate's three claims: the gate is LOSSLESS
  * (the gated query equals the ungated exact pipeline), it actually
  * prunes the train scan (otherwise it's dead weight), and the sidecar
  * is built once and served from the artifact store thereafter. */
class BloomSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  /** The exact train-side contamination grouping with NO bloom gate —
    * the semantics the oracle states. */
  private def ungated() = {
    graft.expressions.ShingleOps.register(spark)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
              expr("graft_minhash_sig(text)").getField("mh0").as("mh0"),
              expr("graft_cgram_count(text, 4)").as("cg"))
    val eval0 = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("eval_id"), col("mh0"),
              col("text").as("text_e"), col("cg").as("ce"))
    val train = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id").as("train_id"), col("mh0").as("nh0"),
              col("text").as("text_t"), col("cg").as("ct"))
    eval0.join(train, col("mh0") === col("nh0"))
      .select(col("eval_id"), col("train_id"),
              expr("graft_cgram_common(text_e, text_t, 4)").as("nc"),
              col("ce"), col("ct"))
      .select(col("eval_id"), col("train_id"),
              (col("nc").cast("double") / (col("ce") + col("ct") - col("nc")))
                .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .groupBy("train_id")
      .agg(count(lit(1)).as("n_eval_hits"),
           min(col("eval_id")).as("first_eval"),
           max(col("jaccard")).as("max_jaccard"))
      .orderBy("train_id")
  }

  test("bloom gate is lossless: gated result equals the exact pipeline") {
    val got = Llm.qTextContaminationBloom(spark, dir).collect()
    val want = ungated().collect()
    assert(got.nonEmpty, "fixture produced no contaminated train docs — spec is vacuous")
    assert(got.toSeq === want.toSeq)
  }

  test("bloom gate prunes a divergent-vocabulary train side") {
    // The synthetic testdata's eval slice saturates the corpus 4-gram
    // space (tiny shared vocabulary), so the gate cannot prune THERE;
    // real eval suites are a sliver of a crawl's n-gram space. Prove
    // the prune property on a fixture with that real-world divergence:
    // eval about one topic, train mostly disjoint alphabets plus one
    // true near-dup that must survive.
    graft.expressions.BloomOps.register(spark)
    import spark.implicits._
    val evalDocs = Seq("alpha beta gamma delta epsilon zeta eta theta")
      .toDF("text")
    val mBits = 1L << 16
    val positions = evalDocs
      .select(explode(expr(
        s"graft_bloom_positions(text, 4, 4, CAST($mBits AS BIGINT))")).as("pos"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](((mBits + 63) / 64).toInt)
    positions.foreach(p => words((p >>> 6).toInt) |= 1L << (p & 63))
    val f = new File(s"/tmp/graft-test-bloom-${java.util.UUID.randomUUID()}.bin")
    graft.expressions.BloomOps.write(f.toString, 4, mBits, words)
    try {
      val train = Seq(
        "alpha beta gamma delta epsilon zeta eta iota", // true near-dup
        "uno dos tres cuatro cinco seis siete ocho nueve diez",
        "jeden dwa trzy cztery piec szesc siedem osiem",
        "moscow river bridge winter snow ice skate frost",
        "quick brown fox jumps over the lazy sleeping dog").toDF("text")
        .select(col("text"),
                expr("graft_cgram_count(text, 4)").as("ct"),
                expr(s"graft_bloom_hits(text, 4, '$f')").as("hits"))
      val kept = train.filter(col("hits") * 3 >= col("ct")).collect()
      assert(kept.length < 5, "gate kept every divergent train doc")
      assert(kept.exists(_.getString(0).startsWith("alpha beta")),
        "gate dropped the true near-dup — NOT lossless")
    } finally f.delete()
  }

  test("distributed word-agg build is bit-identical to a driver-side reference build") {
    // the v2 builder aggregates the bitmap executor-side
    // (graft_bloom_bits); the v1 shape collected distinct positions on
    // the driver. Same positions set bits -> the sidecar words must be
    // EXACTLY equal, under a partitioning that forces real partial
    // merges.
    graft.expressions.BloomOps.register(spark)
    graft.expressions.ShingleOps.register(spark)
    val eval0 = Tables.documents(spark, dir).filter(col("doc_id") % 5 === 0)
      .repartition(13)
    val mBits = 1L << 18
    val packed = eval0
      .agg(expr(s"graft_bloom_bits(graft_bloom_positions(text, 4, 4, " +
        s"CAST($mBits AS BIGINT)), CAST($mBits AS BIGINT))").as("bits"))
      .head().getAs[Array[Byte]](0)
    val bb = java.nio.ByteBuffer.wrap(packed)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val gotWords = Array.fill(packed.length / 8)(bb.getLong())
    val positions = eval0
      .select(explode(expr(
        s"graft_bloom_positions(text, 4, 4, CAST($mBits AS BIGINT))")).as("pos"))
      .distinct().collect().map(_.getLong(0))
    val refWords = new Array[Long](((mBits + 63) / 64).toInt)
    positions.foreach(p => refWords((p >>> 6).toInt) |= 1L << (p & 63))
    assert(gotWords.length === refWords.length)
    assert(gotWords.toSeq === refWords.toSeq,
      "distributed bitmap differs from the reference driver build")
    assert(gotWords.exists(_ != 0L), "empty bitmap — spec is vacuous")
  }

  test("sidecar is built once: second ensure serves the published file") {
    val f1 = Llm.ensureEvalBloom(spark, dir)
    val m1 = new File(f1).lastModified()
    val f2 = Llm.ensureEvalBloom(spark, dir)
    assert(f1 === f2)
    assert(new File(f2).lastModified() === m1, "sidecar was rebuilt")
    val loaded = graft.expressions.BloomOps.load(f1)
    assert(loaded.numHashes === 4)
    assert(loaded.mBits >= (1L << 16))
    assert((loaded.mBits & (loaded.mBits - 1)) === 0L, "mBits not a power of two")
  }

  test("bloom membership never undercounts the true eval overlap (no false negatives)") {
    graft.expressions.BloomOps.register(spark)
    graft.expressions.ShingleOps.register(spark)
    val bloomFile = Llm.ensureEvalBloom(spark, dir)
    val docs = Tables.documents(spark, dir)
    val evalGrams = docs.filter(col("doc_id") % 5 === 0)
      .select(explode(expr(
        "transform(sequence(1, greatest(length(text) - 3, 0)), " +
          "i -> substring(text, i, 4))")).as("gr"))
      .distinct()
    val trainOverlap = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
              explode(expr(
                "array_distinct(transform(sequence(1, greatest(length(text) - 3, 0)), " +
                  "i -> substring(text, i, 4)))")).as("gr"))
      .join(evalGrams, "gr")
      .groupBy("doc_id").agg(count(lit(1)).as("true_overlap"))
    val withHits = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
              expr(s"graft_bloom_hits(text, 4, '$bloomFile')").as("hits"))
      .join(trainOverlap, "doc_id")
    val undercounts = withHits.filter(col("hits") < col("true_overlap")).count()
    assert(undercounts === 0L,
      s"$undercounts train docs report fewer bloom hits than true eval overlap")
  }

  test("contamination hot-bucket cap skips over-cap buckets and the audit accounts them") {
    // round-16 scale-gate catch: the doc-level mh0 blocking was
    // quadratic under exact-duplicate clusters (10->100x exponent
    // 1.50). The collapsed core is result-identical (the lossless
    // test above pins that) and carries the minhashPairsOn-style cap;
    // this pins the cap's skip-and-account behavior plus that the
    // default cap NEVER binds at oracle-checked scales (so the checked
    // answers are the uncapped exact ones).
    val uncapped = Llm.contaminationPairs(spark, dir, bloomGate = false)
      .count()
    assert(uncapped > 0L)
    val capped = Llm.contaminationPairs(spark, dir, bloomGate = false,
      maxBucket = 1).count()
    val audit = Llm.contaminationOverCapBuckets(spark, dir, maxBucket = 1)
      .count()
    assert(capped < uncapped,
      s"cap=1 skipped nothing: $capped vs $uncapped pairs")
    assert(audit > 0L, "cap=1 dropped pairs but the audit reports no buckets")
    assert(Llm.contaminationOverCapBuckets(spark, dir).count() === 0L,
      "default cap binds at sf0.01 — oracle-checked answers would be capped")
  }
}
