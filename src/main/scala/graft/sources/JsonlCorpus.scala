package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion/export — the interchange format LLM training
  * corpora actually ship in (one JSON object per line; The Pile,
  * RedPajama, Dolma, FineWeb all distribute this way). Thin by design:
  * Spark's native JSON source IS the engine here (splittable line
  * reader, schema projection pushed into parsing, whole-stage codegen
  * downstream); this wrapper pins the two decisions a 100 TB ingest
  * must not get wrong:
  *
  *   1. **Explicit schema, never inference** — `spark.read.json` with
  *      no schema runs a FULL extra pass over the corpus to infer one,
  *      and a single odd row (a float where ints live) silently
  *      re-types a column corpus-wide. At 100 TB the inference pass
  *      alone is the whole job's cost, and the re-type is a
  *      correctness bug downstream.
  *   2. **Permissive corrupt-line channel** — web-scale JSONL always
  *      contains broken lines (truncated uploads, encoding damage); a
  *      poison line must land in an in-row error column (the
  *      [[graft.ext.Multimodal]] poison-blob contract), never kill
  *      the job (FAILFAST) or vanish silently (DROPMALFORMED).
  *
  * Round-trip fidelity (write → read preserves every value bit-exactly,
  * JSON string escaping included) is gated end-to-end by q104 against
  * the parquet originals.
  */
object JsonlCorpus {

  val corruptCol = "_graft_corrupt"

  /** Export a DataFrame as JSONL. Plain `df.write.json` — one line per
    * row, one file per partition, so export parallelism and file count
    * follow the input partitioning (coalesce upstream to size files).
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a JSONL corpus under an EXPLICIT schema; malformed lines come
    * back as rows with every data column null and the raw line in
    * [[corruptCol]] — filter `col(corruptCol).isNotNull` to audit them,
    * `.isNull` to proceed with the clean stream.
    */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains $corruptCol")
    spark.read
      .schema(schema.add(StructField(corruptCol, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** [[read]] restricted to clean rows, corrupt column dropped — the
    * common pipeline entry. Caveat (SPARK-21610): Spark refuses a
    * query whose referenced columns are ONLY the corrupt-record
    * column — e.g. a bare `.count()` directly on this result; touch a
    * data column (any projection/filter a real pipeline has anyway) or
    * cache first.
    */
  def readClean(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    read(spark, path, schema)
      .where(col(corruptCol).isNull).drop(corruptCol)
}
