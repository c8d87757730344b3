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

  /** Python-dict literal -> JSON text: single-pass character map
    * (' -> ", ( -> [, ) -> ]) — no regex engine in the per-row path.
    */
  def normalize(c: Column): Column = translate(c, "'()", "\"[]")

  /** Parsed columns (userid, tag, songid, rating) from a pseudo-JSON
    * value. The heterogeneous music tuple is read with JSON-path
    * extraction over the normalized text (no per-row regex).
    */
  def parse(c: Column): (Column, Column, Column, Column) = {
    val norm = normalize(c)
    val parsed = from_json(norm, schema)
    val tag = get_json_object(norm, "$.music[0]")
    val songid = get_json_object(norm, "$.music[1]").cast("int")
    (parsed.getField("userid"), tag, songid, parsed.getField("rating"))
  }
}
