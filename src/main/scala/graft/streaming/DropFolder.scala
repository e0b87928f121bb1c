package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Drop-folder file-stream source shared by the streaming operators.
  *
  * Every operator defaults to `"json"` — the JSONL drop-folder
  * contract of the HTTP track source (one self-describing line per
  * record, appendable by any producer). `"parquet"` is the bulk
  * replay/backfill path: columnar drops round-trip types exactly
  * (doubles carry no decimal-serialization hop) and decode ~2× faster
  * — what a production backfill or the parity-gate replays feed the
  * same operators with. The operator logic downstream is identical;
  * only the decode differs.
  */
private[streaming] object DropFolder {

  def stream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int, format: String): DataFrame =
    reader(spark, schema, Some(maxFilesPerTrigger), format).load(dir)

  /** Line-tolerant read, FLAT columns. The json path reads raw lines
    * and `from_json`s them so an unparseable line can never FAIL the
    * stream — but note Spark's PERMISSIVE contract: a malformed line
    * parses to a row of all-null FIELDS (only a NULL input line
    * yields the null struct dropped here), indistinguishable from a
    * legitimately all-null record. Required-field null filters are
    * therefore the CALLER's job in both formats — every operator
    * filters its key/event-time columns before any watermark or
    * state, which is what actually keeps a malformed line from
    * poisoning a watermark or pinning unexpirable state.
    */
  def lenient(spark: SparkSession, dir: String, schema: StructType,
      format: String, maxFilesPerTrigger: Option[Int] = None): DataFrame =
    format match {
      case "parquet" =>
        reader(spark, schema, maxFilesPerTrigger, format).load(dir)
      case "json" =>
        reader(spark,
          StructType(Seq(StructField("value", StringType))),
          maxFilesPerTrigger, "text").load(dir)
          .select(from_json(col("value"), schema).as("_e"))
          .filter(col("_e").isNotNull)
          .select(schema.fieldNames.toIndexedSeq
            .map(f => col("_e." + graft.core.SqlIdent.quote(f)).as(f)): _*)
      case other => throw new IllegalArgumentException(
        s"unsupported drop-folder format: $other")
    }

  private def reader(spark: SparkSession, schema: StructType,
      maxFilesPerTrigger: Option[Int], format: String) = {
    require(format == "json" || format == "parquet" || format == "text",
      s"unsupported drop-folder format: $format")
    val r = spark.readStream.schema(schema).format(format)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
  }
}
