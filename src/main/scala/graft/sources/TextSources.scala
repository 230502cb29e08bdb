package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File sources for training-data corpora beyond the warehouse reference's
  * CSV surface: JSONL (the dominant interchange format for document
  * corpora) and raw line-oriented text.
  *
  * Scale rules baked in:
  *   - Callers pass an explicit schema — schema inference is a full extra
  *     pass over the data (fine for the reference's CSVs, wrong for 100 TB
  *     of JSONL).
  *   - Malformed records are quarantined, not fatal and not silently
  *     dropped: PERMISSIVE mode routes them to a corrupt-record column so
  *     the ingest can count/inspect them (the same philosophy as the bronze
  *     quality gates).
  */
object TextSources {

  val CorruptCol = "_corrupt_record"

  /** JSON-lines read with explicit schema; malformed lines land in
    * [[CorruptCol]] (added to the schema here — callers pass only the data
    * schema, which therefore must not already contain it).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(
      !schema.fieldNames.contains(CorruptCol),
      s"readJsonl reserves column name $CorruptCol; pass the data schema only")
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** A corrupt-split with its cached source: `valid` (corrupt column
    * dropped), `quarantined` (raw malformed lines), and the cached parent —
    * call [[release]] once both outputs are consumed, or the source frame
    * stays pinned in executor storage.
    */
  final case class CorruptSplit(valid: DataFrame, quarantined: DataFrame, source: DataFrame) {
    def release(): Unit = { source.unpersist(); () }
  }

  /** Split a JSONL read into valid rows and quarantined raw lines. Spark
    * requires caching the frame before filtering on the corrupt column alone
    * — done here so callers can't trip the AnalysisException; the cache
    * handle is returned so the caller can release it.
    */
  def splitCorrupt(df: DataFrame): CorruptSplit = {
    val cached = df.cache()
    CorruptSplit(
      valid = cached.where(col(CorruptCol).isNull).drop(CorruptCol),
      quarantined = cached.where(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")),
      source = cached)
  }

  /** Raw line-oriented text corpus: one row per line with its source file —
    * the "directory of .txt documents" ingest shape. One file never splits
    * across rows' provenance; `input_file_name` is evaluated at scan time.
    */
  def readTextLines(spark: SparkSession, path: String): DataFrame =
    spark.read
      .text(path)
      .select(
        input_file_name().as("source_file"),
        col("value").as("text"))
}
