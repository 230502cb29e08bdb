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
    * schema).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split a JSONL read into (valid rows without the corrupt column,
    * quarantined raw lines). Spark requires caching the frame before
    * filtering on the corrupt column alone — done here so callers can't
    * trip the AnalysisException.
    */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    val good = cached.where(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = cached.where(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))
    (good, bad)
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
