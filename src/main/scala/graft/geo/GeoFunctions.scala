package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.encoding.TermCols
import graft.engine.ExprCompiler.Registry

/**
 * GeoSPARQL simple-features functions, registered in the engine's custom
 * function registry under the geof: namespace — callable from any SPARQL
 * query as `geof:sfContains(?a, ?b)` etc.
 *
 * Beyond the reference: its GeoSPARQL testsuite entry is
 * `#[ignore = "GeoSPARQL not yet implemented"]`
 * (/root/reference/testsuite/tests/oxigraph.rs:26-33); this implementation
 * passes that suite's fixtures. Predicates are Scala UDFs (geometry is
 * genuinely imperative — parse + computational geometry per row); inputs
 * stay two string fields per term, so the UDF never deserialises structs.
 */
object GeoFunctions {

  val GeofNs = "http://www.opengis.net/def/function/geosparql/"

  val predicates: Seq[String] = Seq("sfEquals", "sfDisjoint", "sfIntersects",
    "sfTouches", "sfContains", "sfWithin", "sfCrosses", "sfOverlaps")

  /** NULL Boolean = SPARQL error (non-geometry input or CRS mismatch). */
  private def eval(name: String)(l1: String, d1: String, l2: String, d2: String): java.lang.Boolean = {
    if (l1 == null || l2 == null || d1 == null || d2 == null) return null
    (Geo.parse(l1, d1), Geo.parse(l2, d2)) match {
      case (Some(a), Some(b)) => Geo.predicate(name, a, b) match {
        case Some(v) => java.lang.Boolean.valueOf(v)
        case None => null
      }
      case _ => null
    }
  }

  private val UomNs = "http://www.opengis.net/def/uom/OGC/1.0/"
  private val EarthRadiusM = 6371008.8 // IUGG mean radius

  /** Point-to-point distance in the requested unit (CRS84 geodesic:
    * haversine for metres, central angle for degree/radian). NULL = error
    * (non-point, CRS mismatch, non-CRS84, unknown unit). */
  private def evalDistance(l1: String, d1: String, l2: String, d2: String,
                           unit: String): java.lang.Double = {
    if (l1 == null || l2 == null || d1 == null || d2 == null || unit == null) return null
    (Geo.parse(l1, d1), Geo.parse(l2, d2)) match {
      case (Some(Geo.GPoint(a, ca)), Some(Geo.GPoint(b, cb)))
          if ca == cb && ca == Geo.DefaultCrs =>
        val lat1 = math.toRadians(a.y); val lat2 = math.toRadians(b.y)
        val dLat = lat2 - lat1; val dLon = math.toRadians(b.x - a.x)
        val h = math.pow(math.sin(dLat / 2), 2) +
          math.cos(lat1) * math.cos(lat2) * math.pow(math.sin(dLon / 2), 2)
        val angle = 2 * math.asin(math.min(1.0, math.sqrt(h))) // radians
        unit match {
          case u if u == UomNs + "metre" || u == UomNs + "meter" =>
            java.lang.Double.valueOf(angle * EarthRadiusM)
          case u if u == UomNs + "radian" => java.lang.Double.valueOf(angle)
          case u if u == UomNs + "degree" => java.lang.Double.valueOf(math.toDegrees(angle))
          case _ => null
        }
      case _ => null
    }
  }

  @volatile private var registered = false

  /** Idempotent registration of all geof: functions. */
  def register(): Unit = if (!registered) synchronized {
    if (!registered) {
      predicates.foreach { name =>
        val u = udf(eval(name) _)
        Registry.register(GeofNs + name, { args =>
          val r = u(TermCols.value(args(0)), TermCols.datatypeRaw(args(0)),
            TermCols.value(args(1)), TermCols.datatypeRaw(args(1)))
          when(r.isNull, TermCols.nullTerm).otherwise(TermCols.fromBoolean(r))
        })
      }
      val dist = udf(evalDistance _)
      Registry.register(GeofNs + "distance", { args =>
        val r = dist(TermCols.value(args(0)), TermCols.datatypeRaw(args(0)),
          TermCols.value(args(1)), TermCols.datatypeRaw(args(1)),
          TermCols.value(args(2)))
        when(r.isNull, TermCols.nullTerm).otherwise(TermCols.fromDouble(r))
      })
      registered = true
    }
  }
}
