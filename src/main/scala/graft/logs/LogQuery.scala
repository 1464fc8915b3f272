package graft.logs

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-path parameters for `/v1/logs` (internal/api/api.go:31-106).
  *
  * @param service  required equality filter (api.go:41-46, 400 without it)
  * @param from     inclusive lower ts bound, UTC (api.go:48-55)
  * @param to       exclusive upper ts bound, UTC — the code's WHERE is
  *                 half-open `ts >= ? AND ts < ?` (db.go:84) even though the
  *                 README documents BETWEEN; code wins
  * @param level    optional equality filter (db.go:88-91)
  * @param user     optional `JSONExtractString(attrs,'user') = ?` filter
  *                 (db.go:93-96)
  * @param limit    row cap, default 100 (api.go:73)
  */
final case class LogQueryParams(
    service: String,
    from: Timestamp,
    to: Timestamp,
    level: Option[String] = None,
    user: Option[String] = None,
    limit: Int = 100)

object LogQuery {

  /** Param validation V2-V5 (api.go:41-89): service required, limit > 0,
    * from <= to. (V1 method check and V3 RFC3339 parse live at the HTTP
    * layer; here params arrive typed.) */
  def validate(p: LogQueryParams): Either[String, LogQueryParams] =
    if (p.service == null || p.service.isEmpty) Left("service parameter is required")
    else if (p.limit <= 0) Left("limit must be a positive integer")
    else if (p.from.after(p.to)) Left("'from' must be <= 'to'")
    else Right(p)

  /** The flagship query (SURVEY.md §2.9; db.go:81-99):
    * 7-column projection, required service equality, half-open ts range,
    * optional level equality, optional JSON-attr equality,
    * ORDER BY ts DESC LIMIT n.
    *
    * Scale notes: `orderBy.limit` plans as TakeOrderedAndProject (per-
    * partition top-K merged on the driver — no global sort); all filters are
    * simple predicates Catalyst pushes into the parquet scan; when the table
    * carries the month-partitioned layout ([[LogTable]]), [[monthPredicate]]
    * is added so the ts range also prunes whole month directories, the
    * equivalent of ClickHouse's `PARTITION BY toYYYYMM(ts)` pruning
    * (db.go:51).
    */
  def flagship(logs: DataFrame, p: LogQueryParams): DataFrame = {
    val base = logs
      .filter(col("service") === p.service)
      .filter(col("ts") >= lit(p.from) && col("ts") < lit(p.to))
    val withLevel = p.level.fold(base)(l => base.filter(col("level") === l))
    val withUser = p.user.fold(withLevel)(u =>
      withLevel.filter(LogSchema.attrString(col("attrs"), "user") === u))
    val pruned =
      if (logs.columns.contains("month"))
        withUser.filter(monthPredicate(col("month"), p.from, p.to))
      else withUser
    pruned
      .select("ts", "service", "level", "msg", "attrs", "trace_id", "span_id")
      .orderBy(col("ts").desc)
      .limit(p.limit)
  }

  /** Month-partition pruning predicate derived from a ts range — makes the
    * `partitionBy("month")` layout prune like `PARTITION BY toYYYYMM(ts)`
    * (db.go:51). Emitted explicitly because Catalyst will not infer
    * month-bounds from a ts predicate on its own. */
  def monthPredicate(month: Column, from: Timestamp, to: Timestamp): Column = {
    val fmt = new java.text.SimpleDateFormat("yyyyMM")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    month >= fmt.format(from) && month <= fmt.format(new Timestamp(to.getTime - 1))
  }

  /** Full-table count — the README ops corpus A1 (README.md:92). */
  def countAll(logs: DataFrame): Long = logs.count()
}
