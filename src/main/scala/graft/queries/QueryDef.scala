package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over the testdata tables plus (when
  * SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Contract (driver): result column names must match the oracle's aliases
  * exactly; results carry a deterministic total ORDER BY in both engines.
  * Cross-engine determinism rules used throughout the catalog:
  *   - money/ratio aggregates: cast inputs to DECIMAL (exact, order-free),
  *     cast the final aggregate to DOUBLE (identical bit pattern both sides);
  *   - hashes: md5 hex strings (identical in Spark and DuckDB);
  *   - hex->int: Spark conv(h,16,10) == DuckDB CAST('0x'||h AS BIGINT);
  *   - timestamps: truncate then CAST AS VARCHAR (identical formatting).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
