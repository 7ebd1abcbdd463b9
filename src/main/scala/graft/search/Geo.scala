package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo-point queries — the reference's `LatLonPoint` surface
  * (`lucene/core/src/java/org/apache/lucene/document/LatLonPoint.java:220-268`
  * box query with its encode-ceil lower / encode floor upper bounds and
  * dateline split; `LatLonPointDistanceQuery` bounding-box prune + haversine
  * verify) over plain lat/lon DOUBLE columns.
  *
  * Coordinate quantization is the reference's exact 32-bit encoding
  * (`geo/GeoEncodingUtils.java:37-148`): `encode = floor(deg / DECODE)` with
  * `DECODE = 1 / (2^32 / span)`, computed with the same double expression
  * tree here, in the Column forms, and in the SQL oracles — so engine and
  * oracle quantize bit-identically. Box matching compares ENCODED values
  * (`encodeCeil(min) ≤ enc(x) ≤ encode(max)`), exactly the reference's
  * PointRangeQuery over encoded bytes.
  *
  * Distance uses the standard double haversine with the reference's mean
  * radius (`SloppyMath.java:209`, TO_METERS = 6,371,008.7714) over DECODED
  * (quantized) coordinates — the reference's SloppyMath substitutes
  * table-driven cos/asin approximations for speed; this engine uses exact
  * trig (a few-ulp divergence only at the radius boundary), and applies the
  * same bbox-then-verify two-phase plan so the trig runs on the pruned set.
  * All expressions are Catalyst builtins — codegen'd, and the box
  * conjuncts push down to the parquet scan.
  */
object Geo {
  /** 2^32-step quantization constants (`GeoEncodingUtils.java:39-42`) —
    * DECODE is written as `1 / SCALE` to reproduce the reference's exact
    * double values. */
  val LatScale: Double = (1L << 32) / 180.0
  val LatDecode: Double = 1.0 / LatScale
  val LonScale: Double = (1L << 32) / 360.0
  val LonDecode: Double = 1.0 / LonScale

  /** SloppyMath.TO_METERS — earth mean radius in meters. */
  val ToMeters: Double = 6371008.7714

  def encodeLatitude(lat: Double): Int = {
    require(lat >= -90.0 && lat <= 90.0, s"latitude out of bounds: $lat")
    val l = if (lat == 90.0) math.nextAfter(lat, Double.NegativeInfinity) else lat
    math.floor(l / LatDecode).toInt
  }
  def encodeLatitudeCeil(lat: Double): Int = {
    require(lat >= -90.0 && lat <= 90.0, s"latitude out of bounds: $lat")
    val l = if (lat == 90.0) math.nextAfter(lat, Double.NegativeInfinity) else lat
    math.ceil(l / LatDecode).toInt
  }
  def encodeLongitude(lon: Double): Int = {
    require(lon >= -180.0 && lon <= 180.0, s"longitude out of bounds: $lon")
    val l = if (lon == 180.0) math.nextAfter(lon, Double.NegativeInfinity) else lon
    math.floor(l / LonDecode).toInt
  }
  def encodeLongitudeCeil(lon: Double): Int = {
    require(lon >= -180.0 && lon <= 180.0, s"longitude out of bounds: $lon")
    val l = if (lon == 180.0) math.nextAfter(lon, Double.NegativeInfinity) else lon
    math.ceil(l / LonDecode).toInt
  }
  def decodeLatitude(encoded: Int): Double = encoded * LatDecode
  def decodeLongitude(encoded: Int): Double = encoded * LonDecode

  /** Column-level encode (floor) — the per-point index-time quantization.
    * Mirrors the scalar forms' lat==90 / lon==180 nextDown fold: without it a
    * point exactly at the pole/dateline encodes to 2^31 (out of int range)
    * and never matches a box/distance query whose bound is the pole. */
  def encLat(c: Column): Column = {
    val enc = floor(c / lit(LatDecode)).cast("long")
    when(c >= lit(90.0), lit(encodeLatitude(90.0).toLong)).otherwise(enc)
  }
  def encLon(c: Column): Column = {
    val enc = floor(c / lit(LonDecode)).cast("long")
    when(c >= lit(180.0), lit(encodeLongitude(180.0).toLong)).otherwise(enc)
  }

  /** `LatLonPoint.newBoxQuery` as a pushable predicate: encoded-space range
    * per dimension, dateline-crossing boxes (maxLon < minLon) split into the
    * reference's two open-ended longitude ranges. */
  def boxFilter(latCol: Column, lonCol: Column,
                minLat: Double, maxLat: Double,
                minLon: Double, maxLon: Double): Column = {
    if (minLat == 90.0 || (minLon == 180.0 && maxLon == 180.0)) return lit(false)
    val minLon0 = if (minLon == 180.0 && maxLon < minLon) -180.0 else minLon
    val latOk = encLat(latCol).between(encodeLatitudeCeil(minLat).toLong,
      encodeLatitude(maxLat).toLong)
    val lonEnc = encLon(lonCol)
    val lonOk =
      if (maxLon < minLon0) // crosses the date line: OR of two open ranges
        (lonEnc <= encodeLongitude(maxLon).toLong) ||
          (lonEnc >= encodeLongitudeCeil(minLon0).toLong)
      else
        lonEnc.between(encodeLongitudeCeil(minLon0).toLong,
          encodeLongitude(maxLon).toLong)
    latOk && lonOk
  }

  /** Haversine meters over DECODED (quantized) coordinates, exact trig. */
  def haversineMeters(latCol: Column, lonCol: Column,
                      lat: Double, lon: Double): Column = {
    val qLat = encLat(latCol) * lit(LatDecode)
    val qLon = encLon(lonCol) * lit(LonDecode)
    val qLat2 = lit(decodeLatitude(encodeLatitude(lat)))
    val qLon2 = lit(decodeLongitude(encodeLongitude(lon)))
    val dLat = radians(qLat2 - qLat)
    val dLon = radians(qLon2 - qLon)
    val h = pow(sin(dLat / 2), 2) +
      cos(radians(qLat)) * cos(radians(qLat2)) * pow(sin(dLon / 2), 2)
    lit(2 * ToMeters) * asin(least(lit(1.0), sqrt(h)))
  }

  /** `LongField.newDistanceFeatureQuery`
    * (`lucene/core/src/java/org/apache/lucene/document/LongDistanceFeatureQuery.java:265-267`):
    * score = weight · pivot / (pivot + |value − origin|) — the recency /
    * proximity boost, in [0, weight], exactly weight/2 at the pivot. */
  def longDistanceFeature(valueCol: Column, weight: Double,
                          origin: Long, pivotDistance: Long): Column = {
    require(pivotDistance > 0, s"pivotDistance must be > 0, got $pivotDistance")
    lit(weight) * (lit(pivotDistance.toDouble) /
      (lit(pivotDistance.toDouble) + abs(valueCol - lit(origin)).cast("double")))
  }

  /** `LatLonPoint.newDistanceFeatureQuery`: the same boost over haversine
    * meters from an origin point. */
  def geoDistanceFeature(latCol: Column, lonCol: Column, weight: Double,
                         lat: Double, lon: Double, pivotMeters: Double): Column = {
    require(pivotMeters > 0)
    lit(weight) * (lit(pivotMeters) /
      (lit(pivotMeters) + haversineMeters(latCol, lonCol, lat, lon)))
  }

  /** `LatLonPoint.newDistanceQuery`: a quantized bounding-box prune (pushed
    * to the scan) followed by the exact haversine verify — the reference's
    * two-phase distance plan. */
  def distanceFilter(latCol: Column, lonCol: Column,
                     lat: Double, lon: Double, radiusMeters: Double): Column = {
    // conservative bbox: radius in degrees, widened one quantization step;
    // latitude band is exact, longitude band widens by 1/cos(lat) (clamped
    // to the full range near the poles, like Rectangle.fromPointDistance)
    val dLat = math.toDegrees(radiusMeters / ToMeters) + LatDecode
    val minLat = math.max(-90.0, lat - dLat)
    val maxLat = math.min(90.0, lat + dLat)
    // longitude margin must hold at the WIDEST latitude of the band (cos
    // shrinks poleward) — conservative; the haversine verify is exact
    val maxAbsLat = math.min(89.9999, math.max(math.abs(minLat), math.abs(maxLat)))
    val cosLat = math.cos(math.toRadians(maxAbsLat))
    val bbox =
      if (cosLat <= 1e-9 || math.toDegrees(radiusMeters / (ToMeters * cosLat)) >= 180.0)
        encLat(latCol).between(encodeLatitudeCeil(minLat).toLong, encodeLatitude(maxLat).toLong)
      else {
        val dLon = math.toDegrees(radiusMeters / (ToMeters * cosLat)) + LonDecode
        val lo = lon - dLon
        val hi = lon + dLon
        if (lo < -180.0 || hi > 180.0) {
          // wraps: split like the box query
          val loW = if (lo < -180.0) lo + 360.0 else lo
          val hiW = if (hi > 180.0) hi - 360.0 else hi
          boxFilter(latCol, lonCol, minLat, maxLat, loW, hiW)
        } else boxFilter(latCol, lonCol, minLat, maxLat, lo, hi)
      }
    bbox && (haversineMeters(latCol, lonCol, lat, lon) <= lit(radiusMeters))
  }
}
