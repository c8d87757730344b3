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
    // the heterogeneous ('m1', 1038) tuple normalizes to a JSON array;
    // reading it as array<string> lets ONE Jackson pass serve all four
    // fields (numbers coerce to their literal text)
    StructField("music", ArrayType(StringType)),
    StructField("rating", IntegerType)))

  /** Python-dict literal -> JSON text: single-pass character map
    * (' -> ", ( -> [, ) -> ]) — no regex engine in the per-row path.
    *
    * WIRE-FORMAT PRECONDITION: the translate runs over the whole
    * payload, so quotes/parens/brackets INSIDE field values would be
    * rewritten too. That is safe for this producer's controlled format
    * (keys and the 'mN' tag are bare identifiers, every other field is
    * numeric — line_music.ipynb cell 0); arbitrary text fields would
    * need a real Python-literal parser. Payloads that fail to parse as
    * JSON after normalization surface as NULL columns (from_json
    * returns null on malformed input) rather than mis-parsing silently.
    */
  def normalize(c: Column): Column = translate(c, "'()", "\"[]")

  /** Parsed columns (userid, tag, songid, rating) from a pseudo-JSON
    * value. The heterogeneous music tuple is read with JSON-path
    * extraction over the normalized text (no per-row regex).
    */
  def parse(c: Column): (Column, Column, Column, Column) = {
    val parsed = from_json(normalize(c), schema)
    val music = parsed.getField("music")
    (parsed.getField("userid"), element_at(music, 1),
      element_at(music, 2).cast("int"), parsed.getField("rating"))
  }
}
