package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function surface of the reference engine, built entirely from
  * codegen'd Spark built-ins (no UDFs — every expression here stays inside
  * whole-stage codegen).
  *
  * Reference implementations these mirror:
  *  - in_subnet: firepit/sqlitestorage.py:54-61 (ipaddress.ip_network
  *    subnet_of), pg `inet <<=` firepit/pgcommon.py:45-48. IPv4 only, and the
  *    value may itself be a network ("10.0.0.0/25" is in "10.0.0.0/24").
  *  - match_bin / like_bin: regex / SQL-LIKE over a base64-decoded value
  *    (firepit/sqlitestorage.py:64-87, firepit/pgcommon.py:30-43).
  */
object Funcs {

  /** Dotted-quad IPv4 string -> 32-bit value in a long column. */
  def ip_to_long(ip: Column): Column = {
    val o = split(ip, "\\.")
    element_at(o, 1).cast("long") * 16777216L +
      element_at(o, 2).cast("long") * 65536L +
      element_at(o, 3).cast("long") * 256L +
      element_at(o, 4).cast("long")
  }

  /** CIDR membership: value (addr or subnet) within `cidr`. Null-safe false
    * like the reference's UDF (exceptions there return false).
    */
  def in_subnet(value: Column, cidr: Column): Column = {
    val netParts = split(cidr, "/")
    val netIp = ip_to_long(element_at(netParts, 1))
    val prefix = when(size(netParts) > 1, element_at(netParts, 2).cast("int")).otherwise(lit(32))
    val valParts = split(value, "/")
    val valIp = ip_to_long(element_at(valParts, 1))
    val valPrefix =
      when(size(valParts) > 1, element_at(valParts, 2).cast("int")).otherwise(lit(32))
    // 32-bit network mask for `prefix` leading ones; shiftleft's public
    // overload takes a literal Int shift, so go through call_function to
    // pass a Column shift amount (public API since Spark 3.5)
    val mask = when(prefix === 0, lit(0L))
      .otherwise(
        call_function("shiftleft", lit(-1L), lit(32) - prefix).bitwiseAND(lit(0xFFFFFFFFL)))
    val sameNet = valIp.bitwiseAND(mask) === netIp.bitwiseAND(mask)
    coalesce(sameNet && valPrefix >= prefix, lit(false))
  }

  /** Regex search (re.search semantics = Spark rlike) over base64 payloads. */
  def match_bin(pattern: String, b64: Column): Column =
    decode(unbase64(b64), "UTF-8").rlike(pattern)

  /** SQL LIKE over base64 payloads. Backslashes are literal, as in the
    * reference's escaped-regex implementation (sqlitestorage.py:78-87). */
  def like_bin(pattern: String, b64: Column): Column =
    decode(unbase64(b64), "UTF-8").like(pattern.replace("\\", "\\\\"))

  /** 60-bit integer hash from the first 15 md5 hex chars of the value's
    * string rendering — the engine-portable hash domain shared by minhash
    * (Dedup) and the KMV cardinality sketch: any engine with md5 computes
    * the identical integer. Codegen'd built-ins throughout. */
  def md5Hash60(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** RFC-3339 text rendering of a timestamp column — the reference stores
    * timestamps as ISO text with millisecond precision + 'Z'
    * (firepit/timestamp.py:16-34); we keep TimestampType at rest and render
    * at the API boundary. */
  def rfc3339(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
}
