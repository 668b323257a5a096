package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Monotone double proxies for orderable key columns — the ONE
  * implementation shared by `Ordinals` (bucketed prefix sums / ordinals)
  * and `Layout.zValue` (z-order coordinates), which previously each
  * carried a copy of the same construction.
  *
  * A proxy maps a key to a double such that key order implies proxy
  * order (weakly: proxy ties are allowed and must be resolved by the
  * caller against the full key — buckets built on a proxy put tied keys
  * in the same bucket, which costs balance, never correctness).
  */
private[graft] object KeyProxy {

  /** Proxy for non-string orderable types; None for strings (they need
    * corpus bounds first — see [[string]]). `what` names the caller in
    * the unsupported-type error. */
  def numeric(c: Column, dt: DataType, what: String): Option[Column] = dt match {
    case StringType => None
    case DateType => Some(unix_date(c).cast(DoubleType))
    case TimestampType => Some(c.cast(DoubleType))
    case _: NumericType => Some(c.cast(DoubleType))
    case other => throw new IllegalArgumentException(
      s"$what: unsupported key type $other")
  }

  final case class StringProxy(expr: Column, mn: Double, mx: Double)

  /** Order-preserving proxy for strings given the corpus min/max: the 7
    * bytes after the corpus-wide common prefix, read as an unsigned
    * big-endian integer (7 bytes < 2^56 — no signed-64 overflow in
    * `conv` under ANSI). Strings sharing the min/max's common prefix
    * compare by their suffixes, so the proxy is weakly monotone; strings
    * equal beyond 7 suffix bytes tie. */
  def string(c: Column, mnStr: String, mxStr: String): StringProxy = {
    val (mnB, mxB) = (mnStr.getBytes("UTF-8"), mxStr.getBytes("UTF-8"))
    val cp = mnB.zip(mxB).takeWhile { case (a, b) => a == b }.length
    def proxyOf(b: Array[Byte]): Double =
      BigInt(1, b.drop(cp).take(7).padTo(7, 0.toByte)).toDouble
    val expr = conv(rpad(hex(substring(encode(c, "UTF-8"), cp + 1, 7)),
      14, "0"), 16, 10).cast(DoubleType)
    StringProxy(expr, proxyOf(mnB), proxyOf(mxB))
  }
}
