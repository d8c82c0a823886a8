package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.PolyHash64
import graft.sources.Tables

/** Span-corruption training-example generation (SURVEY.md §2 row 166)
  * — the T5/UL2 denoising objective's DATA step: each document becomes
  * an (input, target) pair where masked token spans are replaced by
  * numbered sentinels in the input and spelled out after their
  * sentinel in the target, closed by a final sentinel. This is an
  * ETL-side operator, not a modeling one: pre-training pipelines
  * materialize denoising examples at corpus scale, and the mask
  * choice must be a pure function of the data so backfills, shard
  * retries and train/eval regeneration agree byte-for-byte.
  *
  * Mask model — BLOCK selection, not sequential span draws: token
  * positions are partitioned into fixed blocks of `blockLen`, and
  * block b of doc d is masked iff pmod(poly_hash64("span|d|b"), 100)
  * < noisePct. Sequential draws (the reference T5 implementation's
  * approach) make position i's fate depend on every draw before it —
  * inherently serial per document; block selection is embarrassingly
  * parallel, keeps the expected noise density exactly noisePct%, and
  * adjacent selected blocks merge naturally into longer spans (mean
  * span length blockLen/(1−p) ≈ the T5 span-length-3 regime for the
  * defaults). The "span|" domain prefix keeps this hash stream
  * independent of the split/fold/mix streams over the same ids.
  *
  * Sentinels: a masked RUN (maximal stretch of selected positions)
  * gets `<extra_id_k>` in document order — run starts are detected
  * with one lag() and numbered with one running sum, both on the same
  * per-doc window; the target closes with `<extra_id_{n_spans}>`, the
  * T5 convention.
  *
  * Scale shape: one posexplode pass over the corpus, ONE per-doc
  * window (lag + running sum share the frame, one exchange keyed on
  * doc_id), one groupBy(doc_id) reassembly via the array_sort ∘
  * collect_list pattern — per-doc state bounded by document length,
  * never corpus-sized; no driver state at all. The documents spine
  * drives the output (left join back), so token-less and NULL-text
  * docs still emit a row: input "", target "<extra_id_0>" — presence
  * is content, the q_version_diff discipline.
  *
  * Exactness: hash, blocking, run numbering and reassembly are all
  * integer/string ops both engines evaluate identically; the oracle
  * replays the hash in HUGEINT (polyHashOverSql) and the reassembly
  * with ordered string_agg.
  */
object SpanCorrupt {

  /** (doc_id, input_text, target_text, n_spans). */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  blockLen: Int = 3, noisePct: Int = 15): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    require(noisePct >= 0 && noisePct <= 100, s"noisePct out of range: $noisePct")
    val toks = docs.select(col(idCol).as("doc_id"),
        expr(s"regexp_extract_all($textCol, '[A-Za-z0-9]+', 0)").as("__l"))
      .select(col("doc_id"), posexplode(col("__l")).as(Seq("pos", "tok")))
      .withColumn("blk", expr(s"CAST(pos AS BIGINT) div $blockLen"))
    val sel = pmod(PolyHash64.poly_hash64(
        concat(lit("span|"), col("doc_id").cast(StringType),
          lit("|"), col("blk").cast(StringType))),
      lit(100L)) < noisePct
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val sentinel = concat(lit("<extra_id_"),
      (sum(when(col("run_start"), 1L).otherwise(0L)).over(w) - 1L).cast(StringType),
      lit(">"))
    val pieces = toks
      .withColumn("sel", sel)
      .withColumn("run_start",
        col("sel") && !coalesce(lag(col("sel"), 1).over(w), lit(false)))
      .withColumn("in_p",
        when(!col("sel"), col("tok")).when(col("run_start"), sentinel))
      .withColumn("tg_p",
        when(col("run_start"), concat(sentinel, lit(" "), col("tok")))
          .when(col("sel"), col("tok")))
    val agg = pieces.groupBy(col("doc_id")).agg(
      array_sort(collect_list(when(col("in_p").isNotNull,
        struct(col("pos"), col("in_p"))))).as("ia"),
      array_sort(collect_list(when(col("tg_p").isNotNull,
        struct(col("pos"), col("tg_p"))))).as("ta"),
      sum(when(col("run_start"), 1L).otherwise(0L)).as("n_spans"))
    val built = agg.select(col("doc_id"),
      concat_ws(" ", transform(col("ia"), s => s.getField("in_p"))).as("input_text"),
      concat_ws(" ", concat(
        transform(col("ta"), s => s.getField("tg_p")),
        array(concat(lit("<extra_id_"), col("n_spans").cast(StringType), lit(">")))))
        .as("target_text"),
      col("n_spans"))
    docs.select(col(idCol).as("doc_id"))
      .join(built, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("<extra_id_0>")).as("target_text"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }

  /** §2 row 166 — the default T5-ish config (blocks of 3, 15% noise)
    * over `documents`. */
  def spanCorruptQ(s: SparkSession, d: String): DataFrame =
    spanCorrupt(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_span_corrupt" -> (spanCorruptQ _),
  )

  val oracles: Map[String, String] = Map(
    // hash replayed in HUGEINT over the DISTINCT (doc, block) domain;
    // run detection/numbering with the same lag + running sum; ordered
    // FILTERed string_agg reassembly; documents spine via LEFT JOIN
    "q_span_corrupt" -> {
      val hb = TrainingOps.polyHashOverSql("doc_id, blk",
        """SELECT doc_id, blk,
          |  'span|' || CAST(doc_id AS VARCHAR) || '|' || CAST(blk AS VARCHAR) AS t
          |FROM (SELECT DISTINCT doc_id, blk FROM tk) _d""".stripMargin)
      s"""WITH tk AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos, l[i + 1] AS tok,
         |    CAST(i // 3 AS BIGINT) AS blk
         |  FROM (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+', 0) AS l
         |        FROM documents) t,
         |    LATERAL (SELECT unnest(range(0, len(l))) AS i) _i),
         |hb AS ($hb),
         |sl AS (
         |  SELECT tk.doc_id, tk.pos, tk.tok,
         |    ((h % 100 + 100) % 100) < 15 AS sel
         |  FROM tk JOIN hb ON tk.doc_id = hb.doc_id AND tk.blk = hb.blk),
         |rs AS (
         |  SELECT *, sel AND NOT COALESCE(
         |      LAG(sel) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS run_start
         |  FROM sl),
         |cm AS (
         |  SELECT *, SUM(CASE WHEN run_start THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS cum
         |  FROM rs),
         |pieces AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN NOT sel THEN tok
         |         WHEN run_start THEN '<extra_id_' || CAST(cum - 1 AS VARCHAR) || '>'
         |    END AS in_p,
         |    CASE WHEN run_start THEN '<extra_id_' || CAST(cum - 1 AS VARCHAR) || '>' || ' ' || tok
         |         WHEN sel THEN tok
         |    END AS tg_p,
         |    run_start
         |  FROM cm),
         |agg AS (
         |  SELECT doc_id,
         |    string_agg(in_p, ' ' ORDER BY pos) FILTER (WHERE in_p IS NOT NULL) AS input_text,
         |    string_agg(tg_p, ' ' ORDER BY pos) FILTER (WHERE tg_p IS NOT NULL) AS tgt_base,
         |    SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS nruns
         |  FROM pieces GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(a.input_text, '') AS input_text,
         |  COALESCE(a.tgt_base || ' ', '')
         |    || '<extra_id_' || CAST(COALESCE(a.nruns, 0) AS VARCHAR) || '>' AS target_text,
         |  CAST(COALESCE(a.nruns, 0) AS BIGINT) AS n_spans
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
  )
}
