package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.{Tables, Warc}

/** Registered query + oracle for the WARC container reader
  * ([[graft.sources.Warc]], SURVEY.md §2 row 254): per-host WARC
  * files are assembled from the documents table IN BOTH ENGINES (the
  * q_sitemap assembly precedent) — a warcinfo lead record plus one
  * response record per document whose payload is synthetic HTML —
  * then the engine splits records honoring Content-Length, routes
  * response payloads through the row-231 Markup gate and the row-232
  * URL canonicalizer. Every 5th payload embeds a VERBATIM fake WARC
  * record (marker, headers, blank line, body) inside its HTML: a
  * parser that splits on the marker without honoring Content-Length
  * invents a phantom record there and fails the oracle. The oracle
  * replays the expected rows from the seeds directly (parsing a
  * well-formed archive is identity — the round trip is the check;
  * malformed-record tolerance is spec-pinned in WarcSpec). */
object WarcOps {

  /** Cluster-visible scratch dir for the two file-staging queries,
    * unique per session. The round-13 advice hazard: a driver-resolved
    * `java.io.tmpdir` path written via foreachPartition means each
    * EXECUTOR writes its own local disk on a multi-node cluster with a
    * `file:` default FS — the subsequent read silently sees a partial
    * seed dir. So: a local master stages under java.io.tmpdir (one
    * host, always visible); a non-local master REQUIRES a non-file
    * default FS and stages under /tmp on it (override with
    * spark.graft.scratch.dir). Suffixing the applicationId makes the
    * dir session-unique — one session's delete-at-start can no longer
    * clobber another's in-flight read — while repeated bench/verify
    * calls in the SAME session still reuse (and re-clear) one dir
    * instead of leaking a fresh tempdir per call. */
  private[graft] def scratchDir(s: SparkSession, name: String)
      : org.apache.hadoop.fs.Path = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val conf = s.sessionState.newHadoopConf()
    val scheme = FileSystem.getDefaultUri(conf).getScheme
    val localFs = scheme == null || scheme == "file"
    val base = s.conf.getOption("spark.graft.scratch.dir").getOrElse {
      if (s.sparkContext.isLocal) sys.props("java.io.tmpdir")
      else {
        require(!localFs,
          s"scratch dir '$name' needs a cluster-visible filesystem: the " +
          "default FS is file:// but the master is non-local, so executor " +
          "writes would land on per-host disks the read never sees - set " +
          "fs.defaultFS to a shared FS or spark.graft.scratch.dir explicitly")
        "/tmp"
      }
    }
    new Path(new Path(base), s"${name}_${s.sparkContext.applicationId}")
  }

  private val CRLF = "\r\n"

  /** The in-payload trap: a complete fake record, verbatim. */
  private val trapText =
    "Trap: WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
      "Content-Length: 3" + CRLF + CRLF + "xyz"

  def warcExtractQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val file = concat(lit("www."), lower(col("source")), lit(".com.warc"))
    val uri = concat(lit("HTTPS://WWW."), upper(col("source")),
      lit(".COM:443/d/"), col("doc_id").cast("string"), lit("?utm_source=w"))
    val bodyHtml = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit("<html><body><p>" + trapText + "</p><p>"), col("text"),
          lit("</p></body></html>")))
      .otherwise(concat(
        lit("<html><body><nav><a href=\"/\">Home</a> <a href=\"/d\">Docs</a></nav><p>"),
        col("text"), lit("</p></body></html>")))
    // the record block is a FULL HTTP response (status line + headers
    // + blank line + entity) -- the real WARC response shape; the
    // engine must strip the HTTP header block before the markup gate
    val httpHdr = "HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html; charset=UTF-8" + CRLF + CRLF
    val payload = concat(lit(httpHdr), bodyHtml)
    val rec = concat(lit("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
        "WARC-Target-URI: "), uri,
      lit(CRLF + "Content-Length: "), length(payload).cast("string"),
      lit(CRLF + CRLF), payload, lit(CRLF + CRLF))
    val files = docs.select(file.as("file"), col("doc_id"), rec.as("rec"))
      .groupBy(col("file"))
      .agg(concat(
        lit("WARC/1.0" + CRLF + "WARC-Type: warcinfo" + CRLF +
          "Content-Length: 0" + CRLF + CRLF + CRLF + CRLF),
        array_join(transform(sort_array(collect_list(
            struct(col("doc_id"), col("rec")))),
          x => x.getField("rec")), "")).as("warc"))
    // persisted: the record carve feeds TWO consumers (the markup gate
    // and the final join's left side) — unpinned, the whole archive
    // parse runs twice (the webIndexQ posture, same comment there)
    val recs = Warc.records(files, "file", "warc")
      .withColumn("doc_id",
        when(col("rec_type") === "response",
          regexp_extract(col("uri"), "/d/([0-9]+)", 1).cast(LongType)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gate = Markup.htmlToText(
      recs.filter(col("rec_type") === "response")
        .select(col("doc_id"), Warc.httpBody(col("body")).as("body")),
      "doc_id", "body")
    recs.join(gate, Seq("doc_id"), "left")
      .select(col("file"), col("rec_pos"), col("rec_type"),
        when(col("uri") === "", lit(""))
          .otherwise(Urls.canonicalUrl(col("uri"))).as("uri_canon"),
        col("content_length"), col("ok"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_extract"), lit("")).as("text_extract"))
      .orderBy(col("file"), col("rec_pos"))
  }

  /** §2 row 254 (WET half) — text-conversion records: per-host WET
    * files (one `conversion` record per doc, payload = the PLAIN
    * text), parsed and run through the row-44 token count and row-42
    * langid — the exact consumer path of a Common Crawl WET segment.
    * Oracle = the metrics computed on the seed text directly
    * (round-trip-is-identity, the q_warc_extract posture). */
  def wetTextQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val file = concat(lit("www."), lower(col("source")), lit(".com.wet"))
    val uri = concat(lit("https://www."), lower(col("source")),
      lit(".com/d/"), col("doc_id").cast("string"))
    val rec = concat(lit("WARC/1.0" + CRLF + "WARC-Type: conversion" + CRLF +
        "WARC-Target-URI: "), uri,
      lit(CRLF + "Content-Length: "), length(col("text")).cast("string"),
      lit(CRLF + CRLF), col("text"), lit(CRLF + CRLF))
    val files = docs.select(file.as("file"), col("doc_id"), rec.as("rec"))
      .groupBy(col("file"))
      .agg(array_join(transform(sort_array(collect_list(
          struct(col("doc_id"), col("rec")))),
        x => x.getField("rec")), "").as("warc"))
    Warc.records(files, "file", "warc")
      .filter(col("rec_type") === "conversion")
      .select(regexp_extract(col("uri"), "/d/([0-9]+)", 1).cast(LongType).as("doc_id"),
        col("content_length"), col("ok"),
        graft.functions.TextFunctions.tokenCount(col("body")).as("n_tokens"),
        graft.functions.TextFunctions.langId(col("body")).as("predicted_lang"))
      .orderBy(col("doc_id"))
  }

  /** §2 row 265 — CDX-style archive index (the lookup companion of
    * the row-254 reader: Common Crawl publishes exactly this shape,
    * cdx-00xxx.gz): one index row per archived capture keyed by the
    * SURT of the canonical URI ([[Urls.surtKey]] — domain-contiguous
    * sort order), carrying (warc_date, url_canon, rec_offset,
    * content_length, digest) — offset+length are the random-access
    * handle into the .warc file, the digest ([[graft.plans.PolyHash64]]
    * over the payload) the dedup/fixity key. Seeds are per-host WARC
    * files assembled from documents IN BOTH ENGINES (resource records
    * with case/port/param noise on the URI and a WARC-Date header);
    * the oracle reconstructs the expected offsets ARITHMETICALLY
    * (warcinfo lead + running sum of record lengths), so the reader's
    * offset accounting — including its glue path — is value-checked,
    * not round-tripped. Scale shape: parallel by file, per-row
    * projections, one sort at the sink (a real CDX build's terminal
    * total-order write).
    *
    * The seed archives below (per-host (file, warc) content) are
    * shared by q_cdx_index (in-plan carving) and q_warc_source (the
    * row-277 DSv2 file reader — same bytes, different ingress). */
  private def cdxSeedFiles(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val file = concat(lit("www."), lower(col("source")), lit(".com.warc"))
    val port = when(pmod(col("doc_id"), lit(7)) === 0, lit(":8080")).otherwise(lit(""))
    val uri = concat(lit("HTTPS://WWW."), upper(col("source")), lit(".COM"), port,
      lit("/Archive/"), pmod(col("doc_id"), lit(5)).cast("string"),
      lit("/p"), col("doc_id").cast("string"), lit(".html?b=2&a=1&utm_campaign=x"))
    val date = concat(lit("2024-02-"),
      lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
      lit("T"), lpad(pmod(col("doc_id"), lit(24)).cast("string"), 2, "0"),
      lit(":00:00Z"))
    val payload = concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
    val rec = concat(lit("WARC/1.0" + CRLF + "WARC-Type: resource" + CRLF +
        "WARC-Target-URI: "), uri,
      lit(CRLF + "WARC-Date: "), date,
      lit(CRLF + "Content-Length: "), length(payload).cast("string"),
      lit(CRLF + CRLF), payload, lit(CRLF + CRLF))
    docs.select(file.as("file"), col("doc_id"), rec.as("rec"))
      .groupBy(col("file"))
      .agg(concat(
        lit("WARC/1.0" + CRLF + "WARC-Type: warcinfo" + CRLF +
          "Content-Length: 0" + CRLF + CRLF + CRLF + CRLF),
        array_join(transform(sort_array(collect_list(
            struct(col("doc_id"), col("rec")))),
          x => x.getField("rec")), "")).as("warc"))
  }

  /** The row-265 index UNsorted — factored out so q_cdx_source can
    * persist and range-sort it exactly once for the write (the
    * crawlPlanFrame pattern: the registered query's presentation sort
    * belongs to the query, not to every consumer). */
  private def cdxIndexFrame(s: SparkSession, d: String): DataFrame = {
    val files = cdxSeedFiles(s, d)
    val canon = Urls.canonicalUrl(col("uri"))
    Warc.records(files, "file", "warc")
      .filter(col("rec_type") === "resource")
      .select(col("file"),
        Urls.surtKey(canon).as("surt"),
        col("warc_date"), canon.as("url_canon"),
        col("rec_offset"), col("content_length"),
        graft.plans.PolyHash64.poly_hash64(col("body")).as("digest"))
  }

  def cdxIndexQ(s: SparkSession, d: String): DataFrame =
    cdxIndexFrame(s, d).orderBy(col("surt"), col("warc_date"))

  /** CDX snapshot diff (SURVEY.md §2 row 275) — the crawl-archive
    * delta two row-265 indexes answer without touching either archive
    * (the Common Crawl month-over-month question, and the crawl twin
    * of row 144's snapshot diff): per surt, `new` (absent before),
    * `gone` (absent now), `changed` (digest differs — a refetch saw
    * different bytes), `same`. One full-outer equi-join on the surt
    * key; digests are the row-265 payload PolyHash64, so `changed`
    * costs no byte comparison (collision odds 2⁻⁶⁴ per pair,
    * documented). */
  def cdxDiff(oldIdx: DataFrame, newIdx: DataFrame): DataFrame =
    oldIdx.select(col("surt"), col("digest").as("__od"))
      .join(newIdx.select(col("surt"), col("digest").as("__nd")),
        Seq("surt"), "full_outer")
      .select(col("surt"),
        when(col("__od").isNull, "new")
          .when(col("__nd").isNull, "gone")
          .when(col("__od") =!= col("__nd"), "changed")
          .otherwise("same").as("verdict"))

  /** §2 row 275 — two seeded snapshots: every 11th-mod-3 URI is new,
    * every 9th-mod-7 gone, every 4th-mod-0 surviving URI refetched
    * with different bytes. The oracle constructs the expected surt
    * LITERALLY (an independent end-to-end check of surtKey) and the
    * verdicts from the seed arithmetic. */
  def cdxDiffQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val url = concat(lit("https://www."), lower(col("source")),
      lit(".com/a/"), col("doc_id").cast("string"))
    val surt = Urls.surtKey(Urls.canonicalUrl(url))
    val h = graft.plans.PolyHash64.poly_hash64 _
    val oldIdx = docs.filter(pmod(col("doc_id"), lit(11)) =!= 3)
      .select(surt.as("surt"), h(col("text")).as("digest"))
    val newIdx = docs.filter(pmod(col("doc_id"), lit(9)) =!= 7)
      .select(surt.as("surt"),
        h(when(pmod(col("doc_id"), lit(4)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("digest"))
    cdxDiff(oldIdx, newIdx).orderBy(col("surt"))
  }

  /** §2 row 277 — the DSv2 file reader over REAL archive files: the
    * cdx seeds are written to a scratch dir (driver-side; the seed
    * frame is host-bounded), read back through
    * `graft.sources.v2.WarcSource` (one partition per file, ISO-8859-1
    * byte==char decode), and projected WITHOUT the body column (the
    * pruning path). The oracle replays the seeds arithmetically —
    * rec_pos from assembly order, offsets from running record
    * lengths — so the whole file-ingress path (write → list → split →
    * carve → offsets) is value-checked end to end. */
  def warcSourceQ(s: SparkSession, d: String): DataFrame = {
    // Seed staging is EXECUTOR-side: the seed frame is collectively
    // the whole documents corpus as ~25 host strings, so a driver
    // collect() would be the one unbounded-driver path in a registered
    // query (round-12 verdict item 2). Each task writes its own
    // partition's archives through the Hadoop FS (scheme-agnostic,
    // credentials ride the serialized session conf). The scratch dir
    // is session-unique, cluster-visible, and cleared at start — see
    // [[scratchDir]] for the multi-node and cross-session hazards.
    val dir = scratchDir(s, "graft_warcsrc_seed")
    val conf = new graft.sources.v2.SerializableHadoopConf(
      s.sessionState.newHadoopConf())
    val fs = dir.getFileSystem(conf.value)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    val dirStr = dir.toString
    cdxSeedFiles(s, d).foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      val efs = new org.apache.hadoop.fs.Path(dirStr).getFileSystem(conf.value)
      it.foreach { r =>
        val out = efs.create(new org.apache.hadoop.fs.Path(dirStr, r.getString(0)), true)
        try out.write(r.getString(1).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        finally out.close()
      }
    }
    s.read.format("graft.sources.v2.WarcSource")
      .option("path", dirStr).load()
      .select(col("file"), col("rec_pos"), col("rec_type"), col("uri"),
        col("content_length"), col("ok"), col("rec_offset"), col("warc_date"))
      .orderBy(col("file"), col("rec_pos"))
  }

  /** §2 row 281 — the CDX index round-tripped through the DSv2 WRITE
    * path ([[graft.sources.v2.CdxSource]]): the row-265 index frame,
    * globally surt-ordered, lands as sorted plain-text cdx part files
    * via the connector's staged-commit protocol, then reads back
    * through the same connector (one partition per file). The oracle
    * is q_cdx_index's VERBATIM — the round trip must be lossless —
    * so this query value-checks the whole write→commit→list→parse
    * loop, the write twin of q_warc_source's read-side check. */
  def cdxSourceQ(s: SparkSession, d: String): DataFrame = {
    val dir = scratchDir(s, "graft_cdxsrc")
    val fs = dir.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(dir, true) // session-unique scratch, cleared at start
    // The global orderBy range-partitions, and the RangePartitioner's
    // SAMPLING pass executes the whole upstream once before the real
    // pass runs it again — unpinned, the seed-assembly + record-carve +
    // digest subtree (the expensive half of this query) runs twice per
    // write (guide §5 — cache what two passes read). Persisted for the
    // write only and dropped before the read-back, which depends on
    // the landed files, not this frame.
    val idx = cdxIndexFrame(s, d)
      .select(col("surt"), col("warc_date"), col("file"), col("rec_offset"),
        col("content_length"), col("digest"), col("url_canon"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      idx
        .orderBy(col("surt"), col("warc_date")) // range-partitioned: files stay sorted
        .write.format("graft.sources.v2.CdxSource")
        .option("path", dir.toString).mode("overwrite").save()
    } finally { idx.unpersist(); () }
    s.read.format("graft.sources.v2.CdxSource")
      .option("path", dir.toString).load()
      .select(col("file"), col("surt"), col("warc_date"), col("url_canon"),
        col("rec_offset"), col("content_length"), col("digest"))
      .orderBy(col("surt"), col("warc_date"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_warc_extract" -> (warcExtractQ _),
    "q_wet_text" -> (wetTextQ _),
    "q_cdx_index" -> (cdxIndexQ _),
    "q_cdx_diff" -> (cdxDiffQ _),
    "q_warc_source" -> (warcSourceQ _),
    "q_cdx_source" -> (cdxSourceQ _))

  // CRLF for SQL string building
  private val NL = "chr(13) || chr(10)"

  /** The cdx seed archives in SQL (seeds -> records -> arithmetic
    * offsets), shared VERBATIM by the q_cdx_index and q_warc_source
    * oracles so the two ingress paths replay identical bytes. */
  private lazy val cdxSeedCtes: String =
    s"""seeds AS (
       |  SELECT doc_id, text,
       |    'www.' || lower(source) || '.com.warc' AS file,
       |    'HTTPS://WWW.' || upper(source) || '.COM'
       |      || (CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END)
       |      || '/Archive/' || CAST(doc_id % 5 AS VARCHAR)
       |      || '/p' || CAST(doc_id AS VARCHAR) || '.html?b=2&a=1&utm_campaign=x' AS url,
       |    '2024-02-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
       |      || 'T' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':00:00Z' AS wdate,
       |    '<html><body><p>' || text || '</p></body></html>' AS payload
       |  FROM documents),
       |recs AS (
       |  SELECT *,
       |    'WARC/1.0' || $NL || 'WARC-Type: resource' || $NL
       |      || 'WARC-Target-URI: ' || url || $NL
       |      || 'WARC-Date: ' || wdate || $NL
       |      || 'Content-Length: ' || CAST(length(payload) AS VARCHAR)
       |      || $NL || $NL || payload || $NL || $NL AS rec
       |  FROM seeds),
       |offs AS (
       |  SELECT doc_id, file, url, wdate,
       |    CAST(length(payload) AS BIGINT) AS content_length,
       |    CAST(length('WARC/1.0' || $NL || 'WARC-Type: warcinfo' || $NL
       |        || 'Content-Length: 0' || $NL || $NL || $NL || $NL)
       |      + COALESCE(SUM(length(rec)) OVER (PARTITION BY file ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rec_offset
       |  FROM recs)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the seeds rebuilt verbatim; uri through the shared canonSql
    // fragment, payload through the shared Markup gate pipeline —
    // expected rows constructed directly (round-trip-is-identity)
    "q_warc_extract" ->
      (s"""WITH resp AS (
         |  SELECT doc_id,
         |    'www.' || lower(source) || '.com.warc' AS file,
         |    'HTTPS://WWW.' || upper(source) || '.COM:443/d/'
         |      || CAST(doc_id AS VARCHAR) || '?utm_source=w' AS url,
         |    (CASE WHEN doc_id % 5 = 0 THEN
         |       '<html><body><p>Trap: WARC/1.0' || $NL
         |       || 'WARC-Type: response' || $NL
         |       || 'Content-Length: 3' || $NL || $NL
         |       || 'xyz</p><p>' || text || '</p></body></html>'
         |     ELSE '<html><body><nav><a href="/">Home</a> <a href="/d">Docs</a></nav><p>'
         |       || text || '</p></body></html>' END) AS html
         |  FROM documents),
         |rp AS (
         |  SELECT doc_id, file, url, html,
         |    ROW_NUMBER() OVER (PARTITION BY file ORDER BY doc_id) AS rec_pos
         |  FROM resp),
         |""".stripMargin
        + Urls.canonSql("rp", Seq("doc_id")) + ",\n"
        + "h AS (SELECT doc_id, html FROM resp),\n"
        + Markup.htmlGatePipelineCtes("h") + s""",
         |info AS (SELECT DISTINCT 'www.' || lower(source) || '.com.warc' AS file
         |         FROM documents)
         |SELECT file, CAST(0 AS BIGINT) AS rec_pos, 'warcinfo' AS rec_type,
         |  '' AS uri_canon, CAST(0 AS BIGINT) AS content_length, TRUE AS ok,
         |  CAST(0 AS BIGINT) AS n_blocks, CAST(0 AS BIGINT) AS n_kept,
         |  '' AS text_extract
         |FROM info
         |UNION ALL
         |SELECT p.file, CAST(p.rec_pos AS BIGINT) AS rec_pos,
         |  'response' AS rec_type, c.url_canon AS uri_canon,
         |  CAST(length(p.html)
         |    + length('HTTP/1.1 200 OK' || $NL
         |      || 'Content-Type: text/html; charset=UTF-8' || $NL || $NL)
         |    AS BIGINT) AS content_length, TRUE AS ok,
         |  COALESCE(a.n_blocks, 0) AS n_blocks,
         |  COALESCE(a.n_kept, 0) AS n_kept,
         |  COALESCE(a.text_extract, '') AS text_extract
         |FROM rp p JOIN canonized c ON p.doc_id = c.doc_id
         |LEFT JOIN agg a ON p.doc_id = a.doc_id
         |ORDER BY file, rec_pos""".stripMargin),

    // the WET metrics computed on the seed text directly; langid CASE
    // and the token pattern shared verbatim with q_lang_id/q_web_gate
    "q_wet_text" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in)\b', 0)) AS c_en,
        |    len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en)\b', 0)) AS c_es,
        |    len(regexp_extract_all(lower(text), '\b(der|die|und|ist|das)\b', 0)) AS c_de,
        |    len(regexp_extract_all(lower(text), '\b(le|les|des|et|dans)\b', 0)) AS c_fr
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS content_length,
        |  TRUE AS ok,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+', 0)) AS BIGINT) AS n_tokens,
        |  CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
        |       WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
        |       WHEN c_de >= c_fr THEN 'de'
        |       ELSE 'fr' END AS predicted_lang
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    // seeds rebuilt verbatim; the expected offset is computed
    // ARITHMETICALLY (warcinfo lead length + running sum of record
    // lengths in doc_id assembly order) so the reader's offset
    // accounting is value-checked; uri through the shared canonSql,
    // surt through the shared surtSql, digest through the shared
    // poly-hash replay
    "q_cdx_index" ->
      ("WITH " + cdxSeedCtes + ",\n"
        + Urls.canonSql("offs", Seq("doc_id")) + ",\n"
        + "dig AS (\n"
        + TrainingOps.polyHashOverSql("doc_id",
            "SELECT doc_id, payload AS t FROM recs") + ")\n"
        + s"""SELECT o.file, ${Urls.surtSql("c.url_canon")} AS surt,
         |  o.wdate AS warc_date, c.url_canon, o.rec_offset, o.content_length,
         |  d.h AS digest
         |FROM offs o
         |JOIN canonized c ON o.doc_id = c.doc_id
         |JOIN dig d ON o.doc_id = d.doc_id
         |ORDER BY surt, warc_date""".stripMargin),

    // the round trip is lossless, so the write-path oracle IS the
    // index oracle verbatim
    "q_cdx_source" ->
      ("WITH " + cdxSeedCtes + ",\n"
        + Urls.canonSql("offs", Seq("doc_id")) + ",\n"
        + "dig AS (\n"
        + TrainingOps.polyHashOverSql("doc_id",
            "SELECT doc_id, payload AS t FROM recs") + ")\n"
        + s"""SELECT o.file, ${Urls.surtSql("c.url_canon")} AS surt,
         |  o.wdate AS warc_date, c.url_canon, o.rec_offset, o.content_length,
         |  d.h AS digest
         |FROM offs o
         |JOIN canonized c ON o.doc_id = c.doc_id
         |JOIN dig d ON o.doc_id = d.doc_id
         |ORDER BY surt, warc_date""".stripMargin),

    // same seed CTEs verbatim; rec_pos from assembly order, offsets
    // from the running record-length sum — the DSv2 file path
    // (write -> list -> split -> carve -> offsets) is value-checked
    "q_warc_source" ->
      ("WITH " + cdxSeedCtes + s""",
         |info AS (SELECT DISTINCT file FROM seeds)
         |SELECT file, CAST(0 AS BIGINT) AS rec_pos, 'warcinfo' AS rec_type,
         |  '' AS uri, CAST(0 AS BIGINT) AS content_length, TRUE AS ok,
         |  CAST(0 AS BIGINT) AS rec_offset, '' AS warc_date
         |FROM info
         |UNION ALL
         |SELECT o.file,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY o.file ORDER BY o.doc_id) AS BIGINT),
         |  'resource', o.url, o.content_length, TRUE, o.rec_offset, o.wdate
         |FROM offs o
         |ORDER BY file, rec_pos""".stripMargin),

    // the expected surt constructed LITERALLY from the seed (an
    // independent check of surtKey) and verdicts from the seed
    // arithmetic: a changed payload always differs in bytes, so the
    // digest comparison must flag exactly the mod-4 survivors
    "q_cdx_diff" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'com,' || lower(source) || ')/a/' || CAST(doc_id AS VARCHAR) AS surt
        |  FROM documents),
        |o AS (SELECT doc_id, surt FROM d WHERE doc_id % 11 <> 3),
        |n AS (SELECT doc_id, surt FROM d WHERE doc_id % 9 <> 7)
        |SELECT COALESCE(o.surt, n.surt) AS surt,
        |  CASE WHEN o.surt IS NULL THEN 'new'
        |       WHEN n.surt IS NULL THEN 'gone'
        |       WHEN n.doc_id % 4 = 0 THEN 'changed'
        |       ELSE 'same' END AS verdict
        |FROM o FULL OUTER JOIN n ON o.surt = n.surt
        |ORDER BY surt""".stripMargin)
}
