package graft

import graft.search.Geo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** [[Geo]] vs the reference's LatLonPoint semantics: the 32-bit quantized
  * encoding (floor/ceil edges, the 90°/180° nextDown special case), box
  * filtering vs a brute-force encoded-space predicate including
  * dateline-crossing boxes, the distance filter's bbox-prune safety (prune +
  * verify ≡ verify alone), and a real-geography sanity distance. */
class GeoSpec extends AnyFunSuite {
  import SparkTestEnv._
  import spark.implicits._

  test("encoding: floor/ceil quantization and pole/dateline edges") {
    val rnd = new Random(5)
    (0 until 2000).foreach { _ =>
      val lat = rnd.nextDouble() * 180 - 90
      val e = Geo.encodeLatitude(lat)
      assert(Geo.decodeLatitude(e) <= lat && lat < Geo.decodeLatitude(e) + Geo.LatDecode)
      assert(Geo.encodeLatitudeCeil(lat) >= e)
      val lon = rnd.nextDouble() * 360 - 180
      val f = Geo.encodeLongitude(lon)
      assert(Geo.decodeLongitude(f) <= lon && lon < Geo.decodeLongitude(f) + Geo.LonDecode)
    }
    // 90.0 / 180.0 are not representable: nextDown applies
    assert(Geo.decodeLatitude(Geo.encodeLatitude(90.0)) < 90.0)
    assert(Geo.decodeLongitude(Geo.encodeLongitude(180.0)) < 180.0)
    assert(Geo.encodeLatitude(-90.0) == Int.MinValue)
    assert(Geo.encodeLongitude(-180.0) == Int.MinValue)
  }

  private def randomPoints(rnd: Random, n: Int) =
    Seq.fill(n)((rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180))

  test("box filter equals the brute-force encoded predicate, incl. dateline boxes") {
    val rnd = new Random(11)
    val pts = randomPoints(rnd, 400)
    val df = pts.zipWithIndex.map { case ((la, lo), i) => (i.toLong, la, lo) }
      .toDF("id", "lat", "lon").cache()
    (0 until 20).foreach { _ =>
      val la1 = rnd.nextDouble() * 170 - 90
      val la2 = la1 + rnd.nextDouble() * (89 - la1)
      val lo1 = rnd.nextDouble() * 360 - 180
      val lo2 = rnd.nextDouble() * 360 - 180 // may be < lo1: dateline box
      val got = df.filter(Geo.boxFilter(col("lat"), col("lon"), la1, la2, lo1, lo2))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = pts.zipWithIndex.collect {
        case ((la, lo), i) if {
          val eLat = Geo.encodeLatitude(la)
          val eLon = Geo.encodeLongitude(lo)
          val latOk = eLat >= Geo.encodeLatitudeCeil(la1) && eLat <= Geo.encodeLatitude(la2)
          val lonOk =
            if (lo2 < lo1) eLon <= Geo.encodeLongitude(lo2) || eLon >= Geo.encodeLongitudeCeil(lo1)
            else eLon >= Geo.encodeLongitudeCeil(lo1) && eLon <= Geo.encodeLongitude(lo2)
          latOk && lonOk
        } => i.toLong
      }.toSet
      assert(got == want, s"box ($la1,$la2,$lo1,$lo2)")
    }
  }

  test("distance filter: bbox prune is a strict superset (prune+verify == verify alone)") {
    val rnd = new Random(13)
    val pts = randomPoints(rnd, 400)
    val df = pts.zipWithIndex.map { case ((la, lo), i) => (i.toLong, la, lo) }
      .toDF("id", "lat", "lon").cache()
    (0 until 15).foreach { _ =>
      val cLat = rnd.nextDouble() * 160 - 80
      val cLon = rnd.nextDouble() * 360 - 180
      val r = 100000.0 + rnd.nextDouble() * 8000000.0 // 100 km .. 8,000 km
      val got = df.filter(Geo.distanceFilter(col("lat"), col("lon"), cLat, cLon, r))
        .select("id").collect().map(_.getLong(0)).toSet
      val verifyOnly = df
        .filter(Geo.haversineMeters(col("lat"), col("lon"), cLat, cLon) <= lit(r))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == verifyOnly, s"center ($cLat,$cLon) r=$r missing=${verifyOnly -- got}")
    }
  }

  test("column encode folds the pole/dateline like the scalar encode (ADVICE r3 #4)") {
    // a document exactly at lat 90 / lon 180 must match a box whose upper
    // bound is the pole/dateline — the scalar encode applies nextDown there,
    // and the Column form must agree
    val df = Seq((1L, 90.0, 180.0), (2L, 89.5, 179.5)).toDF("id", "lat", "lon")
    val encs = df.select(Geo.encLat(col("lat")).as("a"), Geo.encLon(col("lon")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(encs(0)._1 == Geo.encodeLatitude(90.0).toLong)
    assert(encs(0)._2 == Geo.encodeLongitude(180.0).toLong)
    val got = df.filter(Geo.boxFilter(col("lat"), col("lon"), 89.0, 90.0, 179.0, 180.0))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("real-geography sanity: New York to Boston is ~306 km") {
    val df = Seq((42.3601, -71.0589)).toDF("lat", "lon")
    val d = df.select(Geo.haversineMeters(col("lat"), col("lon"), 40.7128, -74.0060).as("d"))
      .head().getDouble(0)
    assert(d > 290000 && d < 320000, s"got $d")
  }
}
