package graft.expressions

import graft.SparkSpec

/** The aggregate kernel surface: every declared registration is
  * SQL-callable after one Kernels.register call, and each kernel
  * returns a sane value through the pure-SQL path (the per-kernel
  * numeric contracts live in their own specs — this pins the
  * registry plumbing both injection paths share). */
class KernelsSpec extends SparkSpec {

  test("Kernels.register makes every kernel resolvable and callable from SQL") {
    Kernels.register(spark)
    val reg = spark.sessionState.functionRegistry
    Kernels.all.foreach { case (id, _, _) =>
      assert(reg.functionExists(id), s"${id.funcName} not registered")
    }
    // graft_bloom_hits reads a sidecar file — give it a real tiny one
    val bloomFile = java.nio.file.Files
      .createTempDirectory("kernels_bloom").toString + "/bloom.bin"
    BloomOps.write(bloomFile, 4, 64L, Array(0L))
    // one smoke call per kernel, through the SQL parser
    val calls = Map(
      "graft_bloom_positions" ->
        "SELECT graft_bloom_positions('abcdef', 4, 4, 64L)",
      "graft_bloom_hits" ->
        s"SELECT graft_bloom_hits('abcdef', 4, '$bloomFile')",
      "graft_dot6" -> "SELECT graft_dot6(array(1.0D, 2.0D), array(3.0D, 4.0D))",
      "graft_sqdist12" ->
        "SELECT graft_sqdist12(array(1.0D, 0.0D), array(0.0D, 1.0D))",
      "graft_quant6" -> "SELECT graft_quant6(array(0.5D, -0.25D))",
      "graft_dotq12" -> "SELECT graft_dotq12(array(2L, 3L), array(5L, 7L))",
      "graft_minhash_sig" -> "SELECT graft_minhash_sig('a b c d e')",
      "graft_shingle_common" ->
        "SELECT graft_shingle_common('a b c d', 'a b c d')",
      "graft_cgram_count" -> "SELECT graft_cgram_count('abcdef', 3)",
      "graft_cgram_common" -> "SELECT graft_cgram_common('abcd', 'abcd', 3)",
      "graft_text_rep" -> "SELECT graft_text_rep('a b a b c').n_tokens",
      "graft_fingerprint" -> "SELECT graft_fingerprint('hello world')",
      "graft_vecsum6" ->
        "SELECT graft_vecsum6(e) FROM (SELECT array(1.0D, 2.0D) AS e)",
      "graft_misra_gries" ->
        "SELECT graft_misra_gries(k, 4) FROM (SELECT explode(array(1L, 1L, 2L)) AS k)",
      "graft_hilbert16" -> "SELECT graft_hilbert16(3L, 4L)",
      "graft_bitmap_agg" ->
        "SELECT graft_bitmap_agg(k, 16) FROM (SELECT explode(array(1L, 5L, 5L)) AS k)",
      "graft_bitmap_card" ->
        "SELECT graft_bitmap_card(graft_bitmap_agg(k, 16)) FROM (SELECT explode(array(1L, 5L, 5L)) AS k)",
      "graft_bitmap_and_card" ->
        "SELECT graft_bitmap_and_card(graft_bitmap_agg(k, 16), graft_bitmap_agg(k, 16)) FROM (SELECT explode(array(1L, 5L)) AS k)",
      "graft_bloom_bits" ->
        "SELECT graft_bloom_bits(graft_bloom_positions('abcdef', 4, 4, 64L), 64L)",
      "graft_kll_agg" ->
        "SELECT graft_kll_agg(k, 200) FROM (SELECT explode(array(1L, 2L, 3L)) AS k)",
      "graft_kll_merge" ->
        "SELECT graft_kll_merge(sk) FROM (SELECT graft_kll_agg(k, 200) AS sk FROM (SELECT explode(array(1L, 2L)) AS k))",
      "graft_kll_quantile" ->
        "SELECT graft_kll_quantile(graft_kll_agg(k, 200), 0.5D) FROM (SELECT explode(array(1L, 2L, 3L)) AS k)",
      "graft_theta_agg" ->
        "SELECT graft_theta_agg(k, 12) FROM (SELECT explode(array(1L, 2L, 2L)) AS k)",
      "graft_theta_estimate" ->
        "SELECT graft_theta_estimate(graft_theta_agg(k, 12)) FROM (SELECT explode(array(1L, 2L, 2L)) AS k)",
      "graft_theta_intersect_estimate" ->
        "SELECT graft_theta_intersect_estimate(graft_theta_agg(k, 12), graft_theta_agg(k, 12)) FROM (SELECT explode(array(1L, 2L)) AS k)",
      "graft_cms_merge" ->
        "SELECT graft_cms_merge(sk) FROM (SELECT count_min_sketch(k, 0.01d, 0.9d, 7) AS sk FROM (SELECT explode(array(1L, 2L)) AS k))",
      "graft_cms_estimate" ->
        "SELECT graft_cms_estimate(count_min_sketch(k, 0.01d, 0.9d, 7), 1L) FROM (SELECT explode(array(1L, 1L, 2L)) AS k)")
    val missing = Kernels.all.map(_._1.funcName).toSet -- calls.keySet
    assert(missing.isEmpty, s"no smoke call for: $missing")
    calls.foreach { case (name, sql) =>
      val rows = spark.sql(sql).collect()
      assert(rows.length == 1, s"$name: no result")
      assert(rows(0).get(0) != null, s"$name: null result")
    }
  }

  test("known values flow through the SQL faces") {
    Kernels.register(spark)
    assert(spark.sql("SELECT graft_dot6(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .collect()(0).getDouble(0) === 11.0)
    assert(spark.sql("SELECT graft_sqdist12(array(1.0D, 0.0D), array(0.0D, 1.0D))")
      .collect()(0).getDouble(0) === 2.0)
    // quantized dot: inputs are scale-6 fixed-point, result descaled by 1e-12
    assert(spark.sql("SELECT graft_dotq12(array(2L, 3L), array(5L, 7L))")
      .collect()(0).getDouble(0) === 31e-12)
    assert(spark.sql("SELECT graft_cgram_common('abcd', 'abcd', 3)")
      .collect()(0).getLong(0) === 2L)
  }
}
