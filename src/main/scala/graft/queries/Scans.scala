package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.{DetSql => D}

/** Scan / projection / pushdown operators (SURVEY.md §2.B "Scans").
  * Reference analog: COO triplet ingest (RelationData construction) —
  * reading (i, j, value) columns off sparse relation storage. Here the
  * parquet scan must show column pruning (ReadSchema) and predicate
  * pushdown (PushedFilters) in the physical plan. */
object Scans {

  // ORDER BY totality: (l_orderkey, l_linenumber) is NOT unique in the
  // generated lineitem (~24% duplicate pairs), so the presentation sort
  // must cover EVERY output column — remaining ties are then full-row
  // duplicates, which hash identically in any order. The round-8 10x
  // sweep caught the underspecified version: DuckDB's external sort
  // reorders ties once it spills, while small in-memory runs of both
  // engines happened to preserve file order.

  def qScanProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  def qScanFilterPrune(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-07-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"),
              unix_timestamp(col("l_shipdate")).as("ship_epoch"),
              col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber", "ship_epoch", "l_extendedprice")

  private val profileCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Column profiler — the table-health scan every ingest pipeline
    * runs before training jobs consume a drop: per column, row count,
    * null count, EXACT distinct count, min and max. One aggregate
    * branch PER COLUMN, unioned: each branch's parquet scan prunes to
    * exactly its one column, so the seven branches together read the
    * same bytes as a single seven-column pass — but each branch's
    * distinct-aggregate shuffles only ITS OWN column's values. The
    * single-aggregate multi-count-distinct alternative (Catalyst's
    * Expand plan) fans every row out x(cols+1) before one shared
    * shuffle and measured 10x slower at sf0.1 (4.2 s vs 0.45 s);
    * branch parallelism also beats one wide stage at any scale.
    * PlanSpec pins the per-branch single-column ReadSchema. At 100 TB
    * exact NDV is a deliberate choice: when approximate suffices, the
    * HLL sketch store (q_agg_hll_persisted) is the serve-many path;
    * this is the exact one-shot audit. */
  def qScanProfile(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    profileCols.map { c =>
      l.select(col(c)).agg(
          count(lit(1)).as("n_rows"),
          count(col(c)).as("nn"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c).cast("double")).as("min_v"),
          max(col(c).cast("double")).as("max_v"))
        .select(lit(c).as("col_name"), col("n_rows"),
          (col("n_rows") - col("nn")).as("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _).orderBy("col_name")
  }

  /** JSONL round trip — the interchange format LLM corpora actually
    * ship in: documents is written ONCE as JSON-lines (content-keyed
    * artifact), read back with an EXPLICIT schema (no inference scan —
    * at 100 TB schema inference is a full extra pass), and summarized
    * per (lang, source) with content-sensitive aggregates (row count,
    * char sum, min/max md5 of the text). The oracle aggregates the
    * ORIGINAL parquet, so a hash match proves the write→read cycle
    * preserved every byte of every document — the JSON escaping edge
    * cases (quotes, unicode, control chars in crawl text) are exactly
    * what this gate exercises. JSONL files split by line, so the
    * read parallelizes like any text source. */
  def qScanJsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val key = graft.ArtifactStore.contentKey(s"$dir/documents.parquet",
      "docs-jsonl-v1")
    val path = graft.ArtifactStore.cachePath("docs_jsonl", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      Tables.documents(s, dir).write.mode("overwrite").json(s"$tmp/data")
    }
    s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, " +
              "n_chars BIGINT")
      .json(s"$path/data")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"),
           min(md5(encode(col("text"), "UTF-8"))).as("min_md5"),
           max(md5(encode(col("text"), "UTF-8"))).as("max_md5"))
      .orderBy("lang", "source")
  }

  /** ORC round trip — the second COLUMNAR format next to parquet (the
    * warehouse-interchange case: ORC is what Hive-era lakes still
    * serve): documents written ONCE as ORC (content-keyed artifact),
    * read back with an explicit schema so the scan column-prunes
    * without a footer-inference pass, summarized with the same
    * content-sensitive aggregates as the JSONL face. The oracle reads
    * the ORIGINAL parquet, so a hash match proves the ORC write→read
    * cycle preserved every byte of every document — string encoding,
    * dictionary pages, and stripe boundaries exercised end to end.
    * ORC splits by stripe, so the read parallelizes like parquet. */
  def qScanOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val key = graft.ArtifactStore.contentKey(s"$dir/documents.parquet",
      "docs-orc-v1")
    val path = graft.ArtifactStore.cachePath("docs_orc", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      Tables.documents(s, dir).write.mode("overwrite").orc(s"$tmp/data")
    }
    s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, " +
              "n_chars BIGINT")
      .orc(s"$path/data")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"),
           min(md5(encode(col("text"), "UTF-8"))).as("min_md5"),
           max(md5(encode(col("text"), "UTF-8"))).as("max_md5"))
      .orderBy("lang", "source")
  }

  /** CSV round trip — the TEXT-delimited interchange format next to
    * the JSONL face (the export surface ETL hand-offs still demand):
    * documents written ONCE as quoted, headered CSV (content-keyed
    * artifact), read back with an explicit schema (no inference pass
    * over the data) and the same content-sensitive aggregates as the
    * other roundtrip faces. The oracle reads the ORIGINAL parquet, so
    * a hash match proves quoting/escaping survived every document
    * byte. CSV splits by line like JSONL, so the read parallelizes;
    * `quoteAll` makes the writer's framing explicit rather than
    * data-dependent (a value-dependent quote decision is exactly
    * where roundtrip bugs hide). The line-splittable read deliberately
    * omits `multiLine` — sound only while no document text embeds a
    * newline and text is never null (multiLine parsing is
    * single-threaded per file, which defeats the face's 100 TB
    * point); OracleBoundsSpec pins that corpus invariant by name so a
    * fixture change fails loudly instead of shredding quoted rows. */
  def qScanCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val key = graft.ArtifactStore.contentKey(s"$dir/documents.parquet",
      "docs-csv-v1")
    val path = graft.ArtifactStore.cachePath("docs_csv", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      Tables.documents(s, dir).write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true")
        .csv(s"$tmp/data")
    }
    s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, " +
              "n_chars BIGINT")
      .option("header", "true")
      .csv(s"$path/data")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"),
           min(md5(encode(col("text"), "UTF-8"))).as("min_md5"),
           max(md5(encode(col("text"), "UTF-8"))).as("max_md5"))
      .orderBy("lang", "source")
  }

  /** Malformed lines injected into the corrupt-scan artifact — a
    * constant so the oracle can state the expected corrupt count
    * arithmetically (the oracle reads the clean parquet and cannot
    * see the bad file). */
  private val corruptLines = 7

  /** PERMISSIVE ingestion — the real-crawl contract: a JSONL corpus
    * with malformed lines mixed in must load WITHOUT failing the job,
    * quarantine the bad lines into `_corrupt_record`, and keep every
    * good row intact. The artifact is the documents corpus as JSONL
    * plus a deterministic junk file (7 malformed lines, written
    * alongside the part files — named so the reader does NOT skip it:
    * `_`/`.` prefixes are invisible to FileInputFormat, which is
    * itself an ingestion trap this face documents). One aggregate
    * groups good rows per (lang, source) and folds the quarantined
    * lines into a sentinel ('__corrupt__') group, so corruption is
    * VISIBLE in the output instead of silently dropped — the oracle
    * states the good-row groups from the clean parquet plus the
    * constant corrupt row. At 100 TB this is one pass; the corrupt
    * branch costs a null test per row. */
  def qScanJsonlCorrupt(s: SparkSession, dir: String): DataFrame = {
    val key = graft.ArtifactStore.contentKey(s"$dir/documents.parquet",
      s"docs-jsonl-corrupt$corruptLines-v1")
    val path = graft.ArtifactStore.cachePath("docs_jsonl_corrupt", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      Tables.documents(s, dir).write.mode("overwrite").json(s"$tmp/data")
      val bad = new java.io.File(s"$tmp/data/zz_corrupt.json")
      val w = new java.io.PrintWriter(bad, "UTF-8")
      try (1 to corruptLines).foreach(i => w.println(s"{broken json line $i"))
      finally w.close()
    }
    val parsed = s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, " +
              "n_chars BIGINT, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$path/data")
    val isBad = col("_corrupt_record").isNotNull
    parsed
      .groupBy(when(isBad, lit("__corrupt__")).otherwise(col("lang"))
                 .as("lang"),
               when(isBad, lit("__corrupt__")).otherwise(col("source"))
                 .as("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"))
      .orderBy("lang", "source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_jsonl_corrupt" -> (qScanJsonlCorrupt _),
    "q_scan_csv_roundtrip" -> (qScanCsvRoundtrip _),
    "q_scan_orc_roundtrip" -> (qScanOrcRoundtrip _),
    "q_scan_jsonl_roundtrip" -> (qScanJsonlRoundtrip _),
    "q_scan_project" -> (qScanProject _),
    "q_scan_filter_prune" -> (qScanFilterPrune _),
    "q_scan_profile" -> (qScanProfile _),
  )

  private val docsRoundtripSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(md5(text)) AS min_md5, MAX(md5(text)) AS max_md5
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  val oracle: Map[String, String] = Map(
    // the oracle reads the CLEAN parquet and states the quarantined
    // junk as the constant sentinel row the engine must surface
    "q_scan_jsonl_corrupt" ->
      s"""SELECT * FROM (
         |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |  FROM documents GROUP BY lang, source
         |  UNION ALL
         |  SELECT '__corrupt__', '__corrupt__',
         |    CAST($corruptLines AS BIGINT), CAST(0 AS BIGINT)
         |) ORDER BY lang, source""".stripMargin,
    // the oracle reads the ORIGINAL parquet: a hash match proves the
    // engine's CSV write->read cycle preserved every document byte
    "q_scan_csv_roundtrip" -> docsRoundtripSql,
    // the oracle reads the ORIGINAL parquet: a hash match proves the
    // engine's ORC write->read cycle preserved every document byte
    "q_scan_orc_roundtrip" -> docsRoundtripSql,
    // the oracle reads the ORIGINAL parquet: a hash match proves the
    // engine's jsonl write->read cycle preserved every document byte
    "q_scan_jsonl_roundtrip" -> docsRoundtripSql,
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q_scan_filter_prune" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${D.epochS("l_shipdate")} AS ship_epoch, l_extendedprice
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate <  TIMESTAMP '1997-07-01'
         |ORDER BY l_orderkey, l_linenumber, ship_epoch, l_extendedprice""".stripMargin,
    "q_scan_profile" -> {
      val per = profileCols.map { c =>
        s"""SELECT '$c' AS col_name, n.n_rows AS n_rows,
           |  n.n_rows - COUNT($c) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS DOUBLE) AS min_v,
           |  CAST(MAX($c) AS DOUBLE) AS max_v
           |FROM lineitem, n GROUP BY n.n_rows""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem)
         |SELECT * FROM (
         |$per
         |) ORDER BY col_name""".stripMargin
    },
  )
}
