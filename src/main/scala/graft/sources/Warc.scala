package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** WARC/WET container reader (SURVEY.md §2 row 254) — the standard
  * input format for web corpora (Common Crawl ships WARC response
  * archives and WET text conversions; both are the same record
  * grammar). This is the container stage AHEAD of the Markup gate,
  * the role the reference's raw JSON landing zone (load.py:46-63)
  * plays for API extracts.
  *
  * Record grammar (ISO 28500): `WARC/1.0\r\n`, header lines, a blank
  * line, then EXACTLY Content-Length bytes of payload, then a
  * `\r\n\r\n` separator. Parsing MUST honor Content-Length — a
  * payload may itself contain the version marker (an archived page
  * about WARC, a crawler dump), and a naive marker split would invent
  * phantom records there.
  *
  * Implementation: per file, split on the marker to get CANDIDATE
  * segments, then fold them left with the `aggregate` higher-order
  * function carrying (records, pending) state: a candidate whose
  * declared Content-Length exceeds the bytes available did NOT end at
  * a real record boundary — the split ate a marker inside its payload
  * — so it parks as `pending` and the next segment is glued back with
  * the marker re-inserted, repeating until the declared length is
  * satisfied. Tolerance: a record with no parseable Content-Length, a
  * trailing truncated record, and junk after a payload all emit with
  * `ok = false` (flagged, never silently dropped or crashed on);
  * bytes before the first marker are skipped.
  *
  * Scale shape (100 TB): one WARC file per row — the Common Crawl
  * layout (~100k files × ~1 GB) parallelizes by FILE, the natural
  * split unit since records are variable-length and gzip-membered in
  * the wild. The fold is a pure per-row codegen'd projection (no UDF,
  * no shuffle, no driver state); memory is bounded by one file per
  * task, the same bound any blob column implies. Operates on STRING
  * payloads (char == byte for the ASCII/UTF-8 corpora here); a binary
  * variant is `decode`/`encode` at the boundary.
  */
object Warc {

  /** Record version marker, including its line break. */
  val Marker = "WARC/1.0\r\n"
  private val MarkerRe = "WARC/1\\.0\r\n"

  private val recSqlType =
    "array<struct<uri:string,rec_type:string,content_length:bigint,body:string," +
      "ok:boolean,offset:bigint,date:string>>"

  private def mkRec(uri: Column, typ: Column, cl: Column, body: Column,
                    ok: Column, off: Column, date: Column): Column =
    struct(uri.as("uri"), typ.as("rec_type"),
      cl.cast(LongType).as("content_length"), body.as("body"), ok.as("ok"),
      off.cast(LongType).as("offset"), date.as("date"))

  private def state(recs: Column, pend: Column, pos: Column): Column =
    struct(recs.as("recs"), pend.as("pend"), pos.cast(LongType).as("pos"))

  /** Header fields of a candidate whose headers end at 1-based `he`
    * (position of the blank line's first char; 0 = no blank line). */
  private def headerFields(cand: Column, he: Column): (Column, Column, Column, Column) = {
    val headers = when(he === 0, cand).otherwise(cand.substr(lit(1), he - 1))
    val clStr = regexp_extract(headers, "(?mi)^Content-Length:\\s*([0-9]+)\\s*$", 1)
    // "0" prefix keeps the cast total when the header is absent; a
    // declared length that overflows Long try_casts to NULL (a plain
    // cast THROWS under ANSI) and normalizes to -1 — same "unparseable
    // length" posture as a missing header, and the SAME value the
    // sequential DSv2 parser emits (parity is spec-pinned on the
    // overflow input)
    val cl = when(clStr === "", lit(-1L))
      .otherwise(coalesce(concat(lit("0"), clStr).try_cast(LongType), lit(-1L)))
    val uri = regexp_extract(headers, "(?mi)^WARC-Target-URI:\\s*(\\S+)\\s*$", 1)
    val typ = regexp_extract(headers, "(?mi)^WARC-Type:\\s*(\\S+)\\s*$", 1)
    val date = regexp_extract(headers, "(?mi)^WARC-Date:\\s*(\\S+)\\s*$", 1)
    (uri, typ, cl, date)
  }

  private def step(acc: Column, seg: Column): Column = {
    val recs = acc.getField("recs")
    val pend = acc.getField("pend")
    // pos = offset of the pending/next record's marker: it advances
    // only when a record EMITS (a parked candidate's marker is still
    // where it was), by marker + candidate — every marker the split
    // consumed inside the candidate has been glued back already
    val pos = acc.getField("pos")
    // a pending candidate means the previous split point was INSIDE a
    // payload: glue the consumed marker back and keep carving
    val cand = when(pend === "", seg).otherwise(concat(pend, lit(Marker), seg))
    val consumed = pos + lit(Marker.length.toLong) + length(cand)
    val he = instr(cand, "\r\n\r\n")
    val (uri, typ, cl, date) = headerFields(cand, he)
    val avail = length(cand) - (he + lit(3))
    val body = cand.substr(he + lit(4), cl)
    val trailer = cand.substr(he + lit(4) + cl, length(cand))
    when(he === 0, state(recs, cand, pos)) // headers not complete yet
      .when(cl === -1L, // unparseable length: flag, consume to segment end
        state(concat(recs, array(mkRec(uri, typ, lit(-1L),
          cand.substr(he + lit(4), length(cand)), lit(false), pos, date))),
          lit(""), consumed))
      .when(avail >= cl, // payload complete: junk after it flags the record
        state(concat(recs, array(mkRec(uri, typ, cl, body,
          trailer.isin("", "\r\n", "\r\n\r\n"), pos, date))), lit(""), consumed))
      .otherwise(state(recs, cand, pos)) // payload continues past the split
  }

  /** A trailing incomplete candidate is a TRUNCATED record — emitted
    * flagged, never silently dropped. */
  private def finish(acc: Column): Column = {
    val recs = acc.getField("recs")
    val pend = acc.getField("pend")
    val pos = acc.getField("pos")
    val he = instr(pend, "\r\n\r\n")
    val (uri, typ, cl, date) = headerFields(pend, he)
    val body = when(he === 0, lit(""))
      .otherwise(pend.substr(he + lit(4), length(pend)))
    when(pend === "", recs)
      .otherwise(concat(recs, array(mkRec(uri, typ, cl, body, lit(false), pos, date))))
  }

  /** Parse a concatenated WARC string into its record array. Record
    * offsets are in the reader's length unit (characters; == bytes
    * for the ASCII/UTF-8-single-byte corpora this string reader
    * serves — same unit Content-Length carving already assumes). */
  def parseRecords(warc: Column): Column = {
    val segs0 = split(warc, MarkerRe)
    // element 1 is whatever precedes the first marker ("" normally,
    // junk tolerated and skipped); its length is where record 0 starts
    val segs = slice(segs0, lit(2), greatest(size(segs0) - 1, lit(0)))
    val init = state(array().cast(recSqlType), lit(""),
      length(element_at(segs0, 1)).cast(LongType))
    aggregate(segs, init, (acc, s) => step(acc, s), acc => finish(acc))
  }

  /** The entity body of an HTTP-message payload: a WARC `response`
    * record's block is the FULL HTTP response (status line + headers
    * + blank line + entity), so consumers strip the header block
    * before the markup gate. Payloads that don't start with `HTTP/`
    * (WET conversions, resource records) pass through unchanged; a
    * headers-only payload yields "". */
  def httpBody(payload: Column): Column = {
    val he = instr(payload, "\r\n\r\n")
    when(payload.startsWith("HTTP/") && he > 0,
      payload.substr(he + lit(4), length(payload)))
      .otherwise(payload)
  }

  /** One row per record: (file, rec_pos, rec_type, uri,
    * content_length, body, ok, rec_offset, warc_date), rec_pos =
    * 0-based order in the file, rec_offset = where the record's
    * marker starts (the random-access handle a CDX index serves),
    * warc_date = the WARC-Date header verbatim ("" when absent). */
  def records(files: DataFrame, fileCol: String, warcCol: String): DataFrame =
    files.select(col(fileCol).as("file"),
        posexplode(parseRecords(col(warcCol))).as(Seq("rec_pos", "r")))
      .select(col("file"), col("rec_pos").cast(LongType).as("rec_pos"),
        col("r.rec_type").as("rec_type"), col("r.uri").as("uri"),
        col("r.content_length").as("content_length"),
        col("r.body").as("body"), col("r.ok").as("ok"),
        col("r.offset").as("rec_offset"), col("r.date").as("warc_date"))
}
