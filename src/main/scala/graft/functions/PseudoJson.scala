package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** F3: decode of the reference's pseudo-JSON wire format.
  *
  * The reference's Kafka payload is a single-quoted Python dict literal
  * with a tuple, e.g. `{'userid': 88888,'music': ('m1', 1038), 'rating': 1}`
  * (line_music.ipynb cell 0), decoded there via `json.loads` + `eval`
  * (spark_streaming_kafka.py:18-20). We never eval: quotes/parens are
  * normalized with regexp_replace and the scalar fields parsed with
  * from_json; the heterogeneous tuple is pulled apart with
  * regexp_extract. All codegen'd built-ins — no UDF, no driver work.
  */
object PseudoJson {

  val schema: StructType = StructType(Seq(
    StructField("userid", IntegerType),
    StructField("rating", IntegerType)))

  /** Python-dict literal -> JSON text (quotes and tuple parens). */
  def normalize(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c, "'", "\""), "\\(", "["), "\\)", "]")

  /** Parsed columns (userid, tag, songid, rating) from a pseudo-JSON value. */
  def parse(c: Column): (Column, Column, Column, Column) = {
    val parsed = from_json(normalize(c), schema)
    val tag = regexp_extract(c, "\\('([^']+)'", 1)
    // regexp_extract yields "" on no-match; under ANSI (Spark 4 default)
    // ''::int throws, so route through nullif-style try_cast
    val ext = regexp_extract(c, "\\('[^']+',\\s*(\\d+)\\)", 1)
    val songid = when(ext === "", lit(null)).otherwise(ext).cast("int")
    (parsed.getField("userid"), tag, songid, parsed.getField("rating"))
  }
}
