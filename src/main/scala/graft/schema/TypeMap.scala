package graft.schema

import org.apache.spark.sql.types._

/** Type-name → Spark type mapping, the engine's equivalent of the
  * reference's `_CAST_TARGETS` table (reference `big_uery_handler.py:14-29`).
  *
  * Unknown names fall back to `StringType`, mirroring the reference's
  * fallback-to-STRING rule (reference `big_uery_handler.py:37`): an
  * unrecognized declared type must never abort an ingest, because any value
  * can be represented as a string.
  *
  * Notes (SURVEY §1.2):
  *  - BIGNUMERIC (76,76→38) cannot be represented losslessly; we cap at
  *    Spark's max DecimalType(38, 38). Out-of-range values become NULL under
  *    safe-cast semantics — documented, not silently wrong.
  *  - TIME and GEOGRAPHY have no Spark type; both ride as strings
  *    ("HH:mm:ss" / WKT).
  */
object TypeMap {
  def toSpark(typeName: String): DataType = typeName.trim.toUpperCase match {
    case "STRING" | "TEXT" | "VARCHAR"  => StringType
    case "BOOL" | "BOOLEAN"             => BooleanType
    case "INT64" | "INTEGER" | "INT" | "BIGINT" | "LONG" => LongType
    case "FLOAT64" | "FLOAT" | "DOUBLE" => DoubleType
    case "NUMERIC"                      => DecimalType(38, 9)
    case "BIGNUMERIC"                   => DecimalType(38, 38)
    case "DATE"                         => DateType
    case "DATETIME"                     => TimestampNTZType
    case "TIMESTAMP"                    => TimestampType
    case "TIME"                         => StringType // no TIME type in Spark
    case "GEOGRAPHY"                    => StringType // WKT passthrough
    case _                              => StringType // reference fallback rule
  }
}
