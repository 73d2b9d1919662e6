package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DuckDB oracles unroll data-dependent loops as bounded
  * GENERATE_SERIES ranges (DuckDB has no per-row unbounded sequence):
  * 512 token positions per document, 2048 characters per document,
  * 16 symbols per word (BPE), 8192 hours per user span (resample).
  * Each bound silently TRUNCATES if the generator ever outgrows it —
  * the Spark side, built on size-driven `sequence`/`transform`, would
  * not — and the divergence only surfaces as a verify-time hash
  * mismatch. This spec pins the measured corpus maxima well under
  * every bound at both test scales, so a generator change trips a
  * named assertion here before it costs an oracle debugging session
  * (round-7 advice item). */
class OracleBoundsSpec extends SparkSpec {

  for (scale <- Seq("sf0.01", "sf0.1")) {
    test(s"$scale: corpus maxima stay under every oracle series bound") {
      val dir = sf(scale)
      val docs = graft.Tables.documents(spark, dir)
      val m = docs.agg(
        max(size(filter(split(col("text"), " "), t => t =!= "")))
          .as("max_tokens"),
        max(length(col("text"))).as("max_chars"),
        max(array_max(transform(
          filter(split(col("text"), " "), t => t =!= ""), t => length(t))))
          .as("max_word")).head()
      val (maxTokens, maxChars, maxWord) =
        (m.getInt(0), m.getInt(1), m.getInt(2))
      info(s"$scale: max tokens/doc=$maxTokens chars/doc=$maxChars " +
        s"word len=$maxWord")
      // 512-position unrolls: shingles (minhash family), bigram LM,
      // span-mask token grids, 512x64-token chunk cap
      assert(maxTokens <= 512,
        s"doc token count $maxTokens exceeds the 512-position oracle unroll")
      // 2048-char unroll: rolling fingerprint
      assert(maxChars <= 2048,
        s"doc length $maxChars exceeds the 2048-char fingerprint unroll")
      // 512-bigram unroll: BOTH DSIR oracles (q_select_dsir and
      // q_select_dsir_hashed) enumerate bigram positions 1..512 via
      // GENERATE_SERIES while the Spark side enumerates ALL positions
      // via sequence(1, size(tk)-1) — and DSIR splits on ' ' WITHOUT
      // dropping empty tokens, so its bound is on the raw split size:
      // <=513 split tokens per doc keeps positions <=512 (round-15
      // advice item)
      val maxSplit = docs
        .agg(max(size(split(col("text"), " ")))).head().getInt(0)
      info(s"$scale: max raw split tokens/doc=$maxSplit")
      assert(maxSplit <= 513,
        s"raw split token count $maxSplit exceeds the DSIR oracles' " +
          "512-bigram GENERATE_SERIES unroll (needs <=513)")
      // 16-pair unroll per word: BPE adjacent-pair counting reads
      // positions 1..16 of the symbol list (i < len), i.e. words up to
      // 17 symbols are exact
      assert(maxWord <= 16,
        s"word length $maxWord exceeds the BPE 16-symbol-pair unroll")

      // CSV roundtrip invariant (round-14 ADVICE): q_scan_csv_roundtrip
      // reads the artifact WITHOUT multiLine (so the scan stays
      // line-splittable — the 100 TB point of the face); that contract
      // is only sound while no document text embeds a newline or CR,
      // and quoteAll conflates null text with '' on the trip — pin
      // both here so a fixture change trips a named assertion instead
      // of a silent hash mismatch
      val badText = docs.filter(col("text").isNull ||
        col("text").contains("\n") || col("text").contains("\r")).count()
      assert(badText === 0L,
        s"$badText docs have null/newline text — the multiLine-free CSV " +
          "roundtrip contract no longer holds; switch the read to " +
          "multiLine=true (and give up split parallelism) or re-fence")

      // 8192-hour unroll: the resample grid spans each user's
      // (min hour, max hour) range
      val span = graft.Tables.events(spark, dir)
        .select(col("user_id"),
                expr("unix_micros(ts) DIV 3600000000").as("hr"))
        .groupBy("user_id").agg((max("hr") - min("hr")).as("span"))
        .agg(max("span")).head().getLong(0)
      info(s"$scale: max per-user hour span=$span")
      assert(span <= 8192,
        s"per-user hour span $span exceeds the 8192-hour resample unroll")
    }
  }
}
