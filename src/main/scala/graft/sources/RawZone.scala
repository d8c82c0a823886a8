package graft.sources

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Raw JSON landing zone with date-range directory encoding.
  *
  * Mirrors the reference's GCS layout and semantics
  * (`raw/oura/{data_type}/{start}_{end}/data.json`):
  * - writes land one directory per extraction window (load.py:46-63)
  * - listing parses the window from the path and HARD-ERRORS on
  *   overlapping windows (common_utils.py:60-75, load.py:283-298)
  * - range reads open only the directories whose window intersects the
  *   request — path-level pruning, the file-source analog of partition
  *   pruning (load.py:246-267)
  * - the next extraction window starts after the max landed date, with
  *   a HISTORICAL_DAYS backfill on first run (extract.py:170-177,
  *   constants.py:17)
  *
  * Directory listing is driver-side metadata work, same as Spark's own
  * file index; data itself never touches the driver.
  */
object RawZone {

  val HistoricalDays = 365

  final case class RangeDir(dataType: String, start: LocalDate, end: LocalDate, path: String)

  final case class OverlappingRangesException(a: RangeDir, b: RangeDir)
    extends IllegalStateException(
      s"Overlapping date ranges for ${a.dataType}: " +
      s"[${a.start}, ${a.end}] at ${a.path} vs [${b.start}, ${b.end}] at ${b.path}")

  private val RangeRe = raw"(\d{4}-\d{2}-\d{2})_(\d{4}-\d{2}-\d{2})".r

  def write(df: DataFrame, root: String, dataType: String,
            start: LocalDate, end: LocalDate): String = {
    val dir = s"$root/$dataType/${start}_$end"
    df.write.mode("overwrite").json(dir)
    dir
  }

  /** Landed windows for a data type, overlap-validated. Only COMMITTED
    * directories count (the committer's _SUCCESS marker): a landing job
    * that died mid-write leaves the range dir without the marker, and
    * counting it as landed would silently skip those days forever —
    * this way the next run re-extracts and `write`'s overwrite mode
    * replaces the partial output. */
  def listRanges(spark: SparkSession, root: String, dataType: String): Seq[RangeDir] = {
    val base = new Path(s"$root/$dataType")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq.empty
    val dirs = fs.listStatus(base).filter(_.isDirectory).toSeq.flatMap { st =>
      st.getPath.getName match {
        case RangeRe(s, e) if fs.exists(new Path(st.getPath, "_SUCCESS")) =>
          Some(RangeDir(dataType, LocalDate.parse(s), LocalDate.parse(e),
            st.getPath.toString))
        case _ => None
      }
    }.sortBy(_.start)
    dirs.sliding(2).foreach {
      case Seq(a, b) if !b.start.isAfter(a.end) => throw OverlappingRangesException(a, b)
      case _ => ()
    }
    dirs
  }

  /** All landed days (the reference's raw-date inventory). */
  def landedDates(spark: SparkSession, root: String, dataType: String): Set[LocalDate] =
    listRanges(spark, root, dataType).flatMap { r =>
      Iterator.iterate(r.start)(_.plusDays(1)).takeWhile(!_.isAfter(r.end))
    }.toSet

  /** Read only the directories whose window intersects [start, end]. */
  def readRange(spark: SparkSession, root: String, dataType: String,
                start: LocalDate, end: LocalDate, schema: StructType): DataFrame = {
    val hit = listRanges(spark, root, dataType)
      .filter(r => !r.end.isBefore(start) && !r.start.isAfter(end))
      .map(_.path)
    if (hit.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(hit: _*)
  }

  /** The resume contract as pure arithmetic — the ONE place the
    * watermark window is computed: (max landed + 1) .. today-1; first
    * run backfills `historicalDays`; None when already up to date.
    * Every extraction path (HealthPipeline via nextExtractionWindow,
    * ExtractClient.planRequests) plans through here. */
  def resumeWindow(landedMax: Option[LocalDate], today: LocalDate,
                   historicalDays: Int = HistoricalDays): Option[(LocalDate, LocalDate)] = {
    val endDate = today.minusDays(1)
    val start = landedMax.map(_.plusDays(1))
      .getOrElse(endDate.minusDays(historicalDays.toLong))
    if (start.isAfter(endDate)) None else Some((start, endDate))
  }

  /** [[resumeWindow]] against the landed raw zone. */
  def nextExtractionWindow(spark: SparkSession, root: String, dataType: String,
                           today: LocalDate,
                           historicalDays: Int = HistoricalDays): Option[(LocalDate, LocalDate)] =
    resumeWindow(listRanges(spark, root, dataType).lastOption.map(_.end),
      today, historicalDays)

  /** Split a window into chunks with the reference's exact stepping
    * (extract.py:137-149): `chunk_end = min(start + chunkDays, end)` —
    * a "7-day" chunk spans 8 inclusive days — then the next window
    * starts at `chunk_end + 1`. */
  def chunkWindow(start: LocalDate, end: LocalDate, chunkDays: Int): Seq[(LocalDate, LocalDate)] = {
    require(chunkDays > 0, s"chunkDays must be positive, got $chunkDays")
    val out = Seq.newBuilder[(LocalDate, LocalDate)]
    var cur = start
    while (!cur.isAfter(end)) {
      val stretched = cur.plusDays(chunkDays.toLong)
      val chunkEnd = if (stretched.isBefore(end)) stretched else end
      out += ((cur, chunkEnd))
      cur = chunkEnd.plusDays(1)
    }
    out.result()
  }
}
