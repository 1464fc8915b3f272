package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse-exact `JSONExtractString(json, key)` (internal/db/db.go:94):
  * returns `''` — not NULL — for a missing key, a non-string value, or
  * malformed JSON.
  *
  * Spark's `get_json_object` yields NULL in those cases. Inside the
  * reference's only use (an equality filter, SURVEY §2.5 X1) the two are
  * observably identical, so the hot path keeps the codegen'd builtin; this
  * wrapper exists for API parity when the extraction value itself is
  * projected (e.g. `SELECT JSONExtractString(attrs,'user')` shapes).
  */
object JsonExtractString {
  def jsonExtractString(json: Column, key: String): Column =
    coalesce(get_json_object(json, s"$$.$key"), lit(""))
}
