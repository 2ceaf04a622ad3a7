package graft.geo

/**
 * Minimal simple-features geometry for GeoSPARQL: WKT + GeoJSON parsing and
 * the seven sf* topological predicates over points, polylines, and simple
 * (single-ring) polygons.
 *
 * The reference leaves GeoSPARQL unimplemented (testsuite/tests/
 * oxigraph.rs:26 `#[ignore = "GeoSPARQL not yet implemented"]`); this module
 * goes beyond it, passing the reference repo's own geosparql fixture suite
 * (testsuite/oxigraph-tests/geosparql).
 *
 * Topology is decided by classifying interactions of interiors/boundaries
 * (the DE-9IM cells each predicate needs) with an epsilon tolerance; lines
 * are split at every boundary intersection and classified by subsegment
 * midpoints — robust for simple inputs, no external geometry library.
 */
object Geo {

  private val Eps = 1e-9

  final case class Pt(x: Double, y: Double)

  sealed trait Geom { def crs: String }
  final case class GPoint(p: Pt, crs: String) extends Geom
  final case class GLine(pts: Vector[Pt], crs: String) extends Geom
  final case class GPolygon(ring: Vector[Pt], crs: String) extends Geom // closed: ring.head == ring.last not stored

  val DefaultCrs = "http://www.opengis.net/def/crs/OGC/1.3/CRS84"
  val WktLiteral = "http://www.opengis.net/ont/geosparql#wktLiteral"
  val GeoJsonLiteral = "http://www.opengis.net/ont/geosparql#geoJSONLiteral"

  // ------------------------------------------------------------------ parsing

  /** Parse a geo literal by datatype IRI; None = malformed/unsupported. */
  def parse(lexical: String, datatype: String): Option[Geom] = datatype match {
    case WktLiteral => parseWkt(lexical)
    case GeoJsonLiteral => parseGeoJson(lexical)
    case _ => None
  }

  def parseWkt(s0: String): Option[Geom] = {
    var s = s0.trim
    var crs = DefaultCrs
    if (s.startsWith("<")) {
      val end = s.indexOf('>')
      if (end < 0) return None
      crs = s.substring(1, end)
      s = s.substring(end + 1).trim
    }
    val open = s.indexOf('(')
    if (open < 0) return None
    val kind = s.substring(0, open).trim.toUpperCase
    val body = s.substring(open)
    kind match {
      case "POINT" =>
        coordList(strip(body)).flatMap(ps => if (ps.size == 1) Some(GPoint(ps.head, crs)) else None)
      case "LINESTRING" =>
        coordList(strip(body)).flatMap(ps => if (ps.size >= 2) Some(GLine(ps, crs)) else None)
      case "POLYGON" =>
        // single outer ring only (inner holes unsupported)
        val inner = strip(body).trim
        if (!inner.startsWith("(")) return None
        coordList(strip(inner)).flatMap { ps =>
          val ring = if (ps.size > 1 && ps.head == ps.last) ps.init else ps // auto-close
          if (ring.size >= 3) Some(GPolygon(ring, crs)) else None
        }
      case _ => None
    }
  }

  private def strip(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1) else t
  }

  private def coordList(s: String): Option[Vector[Pt]] =
    try Some(s.split(",").toVector.map { c =>
      val parts = c.trim.split("\\s+")
      Pt(parts(0).toDouble, parts(1).toDouble)
    }) catch { case _: Exception => None }

  def parseGeoJson(s: String): Option[Geom] =
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(s)
      val coords = node.get("coordinates")
      def pt(n: com.fasterxml.jackson.databind.JsonNode): Pt =
        Pt(n.get(0).asDouble, n.get(1).asDouble)
      node.get("type").asText match {
        case "Point" => Some(GPoint(pt(coords), DefaultCrs))
        case "LineString" =>
          Some(GLine((0 until coords.size).map(i => pt(coords.get(i))).toVector, DefaultCrs))
        case "Polygon" =>
          val ring0 = coords.get(0)
          val ps = (0 until ring0.size).map(i => pt(ring0.get(i))).toVector
          val ring = if (ps.size > 1 && ps.head == ps.last) ps.init else ps
          if (ring.size >= 3) Some(GPolygon(ring, DefaultCrs)) else None
        case _ => None
      }
    } catch { case _: Exception => None }

  // ----------------------------------------------------------- low-level geom

  private def near(a: Double, b: Double): Boolean = math.abs(a - b) <= Eps
  private def samePt(a: Pt, b: Pt): Boolean = near(a.x, b.x) && near(a.y, b.y)

  /** >0 left turn, <0 right turn, 0 collinear (with tolerance). */
  private def orient(a: Pt, b: Pt, c: Pt): Double = {
    val v = (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)
    if (math.abs(v) <= Eps) 0.0 else v
  }

  private def onSegment(a: Pt, b: Pt, p: Pt): Boolean =
    orient(a, b, p) == 0.0 &&
      p.x >= math.min(a.x, b.x) - Eps && p.x <= math.max(a.x, b.x) + Eps &&
      p.y >= math.min(a.y, b.y) - Eps && p.y <= math.max(a.y, b.y) + Eps

  /** All intersection points of segments ab and cd (0, 1, or 2 for
    * collinear-overlap endpoints). */
  private def segIntersections(a: Pt, b: Pt, c: Pt, d: Pt): Seq[Pt] = {
    val o1 = orient(a, b, c); val o2 = orient(a, b, d)
    val o3 = orient(c, d, a); val o4 = orient(c, d, b)
    if (o1 == 0.0 && o2 == 0.0) { // collinear: overlap endpoints
      Seq(c, d, a, b).filter(p => onSegment(a, b, p) && onSegment(c, d, p))
    } else if (((o1 > 0) != (o2 > 0) || o1 == 0.0 || o2 == 0.0) &&
               ((o3 > 0) != (o4 > 0) || o3 == 0.0 || o4 == 0.0)) {
      // general intersection (incl. endpoint touches)
      val d1x = b.x - a.x; val d1y = b.y - a.y
      val d2x = d.x - c.x; val d2y = d.y - c.y
      val denom = d1x * d2y - d1y * d2x
      if (math.abs(denom) <= Eps) {
        Seq(c, d, a, b).filter(p => onSegment(a, b, p) && onSegment(c, d, p))
      } else {
        val t = ((c.x - a.x) * d2y - (c.y - a.y) * d2x) / denom
        Seq(Pt(a.x + t * d1x, a.y + t * d1y))
      }
    } else Nil
  }

  private def ringSegments(ring: Vector[Pt]): Seq[(Pt, Pt)] =
    ring.indices.map(i => (ring(i), ring((i + 1) % ring.size)))

  private def lineSegments(pts: Vector[Pt]): Seq[(Pt, Pt)] =
    pts.indices.dropRight(1).map(i => (pts(i), pts(i + 1)))

  private def onRing(ring: Vector[Pt], p: Pt): Boolean =
    ringSegments(ring).exists { case (a, b) => onSegment(a, b, p) }

  /** Strictly inside the ring (not on it) — ray casting. */
  private def insideRing(ring: Vector[Pt], p: Pt): Boolean = {
    if (onRing(ring, p)) return false
    var in = false
    ringSegments(ring).foreach { case (a, b) =>
      if ((a.y > p.y) != (b.y > p.y)) {
        val xint = a.x + (p.y - a.y) * (b.x - a.x) / (b.y - a.y)
        if (p.x < xint) in = !in
      }
    }
    in
  }

  private def onPolyline(pts: Vector[Pt], p: Pt): Boolean =
    lineSegments(pts).exists { case (a, b) => onSegment(a, b, p) }

  /** A point strictly inside the polygon: midpoint of the first interior
    * span of a horizontal scanline through the bbox middle. */
  private def interiorPoint(ring: Vector[Pt]): Pt = {
    val ys = ring.map(_.y)
    // a y that avoids vertices (vertex-crossing ambiguity)
    val candidates = (1 to 7).map(i => ys.min + (ys.max - ys.min) * i / 8.0) ++
      Seq((ys.min + ys.max) / 2 + Eps * 3)
    candidates.foreach { y =>
      if (!ring.exists(v => near(v.y, y))) {
        val xs = ringSegments(ring).flatMap { case (a, b) =>
          if ((a.y > y) != (b.y > y)) Some(a.x + (y - a.y) * (b.x - a.x) / (b.y - a.y)) else None
        }.sorted
        if (xs.size >= 2) {
          val mid = Pt((xs(0) + xs(1)) / 2, y)
          if (insideRing(ring, mid)) return mid
        }
      }
    }
    // degenerate fallback: centroid
    Pt(ring.map(_.x).sum / ring.size, ring.map(_.y).sum / ring.size)
  }

  /** Split the polyline at every intersection with the given segments and
    * return subsegment midpoints (the line's interior sample points). */
  private def splitMidpoints(pts: Vector[Pt], cutters: Seq[(Pt, Pt)]): Seq[Pt] =
    lineSegments(pts).flatMap { case (a, b) =>
      val cuts = cutters.flatMap { case (c, d) => segIntersections(a, b, c, d) }
      val ts = (Seq(0.0, 1.0) ++ cuts.map { p =>
        if (math.abs(b.x - a.x) > math.abs(b.y - a.y)) (p.x - a.x) / (b.x - a.x)
        else if (math.abs(b.y - a.y) > Eps) (p.y - a.y) / (b.y - a.y) else 0.0
      }).filter(t => t >= -Eps && t <= 1 + Eps).distinct.sorted
      ts.zip(ts.tail).collect { case (t1, t2) if t2 - t1 > Eps =>
        val tm = (t1 + t2) / 2
        Pt(a.x + tm * (b.x - a.x), a.y + tm * (b.y - a.y))
      }
    }

  // ----------------------------------------------- interaction classification

  /** Interaction flags between two geometries: interiors intersect (ii),
    * any-closure intersection (any), A-interior ∩ B-exterior (ie), the
    * mirror (ei), and — for curve/curve pairs — whether the interior
    * intersection is 1-dimensional (ii1: a shared collinear run, not just
    * crossing points). Everything each predicate needs. */
  private final case class Rel(ii: Boolean, any: Boolean, ie: Boolean, ei: Boolean,
                               ii1: Boolean = false)

  private def relate(a: Geom, b: Geom): Rel = (a, b) match {
    case (GPoint(p, _), GPoint(q, _)) =>
      val eq = samePt(p, q)
      Rel(ii = eq, any = eq, ie = !eq, ei = !eq)

    case (GPoint(p, _), GLine(pts, _)) =>
      val endpoints = Seq(pts.head, pts.last)
      val onAny = onPolyline(pts, p)
      val onEnd = endpoints.exists(samePt(_, p))
      Rel(ii = onAny && !onEnd, any = onAny, ie = !onAny, ei = true)
    case (_: GLine, _: GPoint) => relate(b, a).mirror

    case (GPoint(p, _), GPolygon(ring, _)) =>
      val in = insideRing(ring, p)
      val on = onRing(ring, p)
      Rel(ii = in, any = in || on, ie = !(in || on), ei = true)
    case (_: GPolygon, _: GPoint) => relate(b, a).mirror

    case (GLine(la, _), GLine(lb, _)) =>
      val segsB = lineSegments(lb)
      val midsA = splitMidpoints(la, segsB)
      val midsB = splitMidpoints(lb, lineSegments(la))
      val ii = midsA.exists(onPolyline(lb, _)) ||
        // proper single-point crossing: any intersection not at a midpoint-run
        lineSegments(la).exists { case (s1, s2) => segsB.exists { case (t1, t2) =>
          segIntersections(s1, s2, t1, t2).exists(x =>
            !Seq(la.head, la.last).exists(samePt(_, x)) &&
            !Seq(lb.head, lb.last).exists(samePt(_, x))) } }
      val anyX = lineSegments(la).exists { case (s1, s2) => segsB.exists { case (t1, t2) =>
        segIntersections(s1, s2, t1, t2).nonEmpty } }
      // dimension of the interior meet: a subsegment midpoint lying ON the
      // other line means a collinear run (1-dim); crossings alone are 0-dim
      Rel(ii = ii, any = anyX,
        ie = midsA.exists(m => !onPolyline(lb, m)),
        ei = midsB.exists(m => !onPolyline(la, m)),
        ii1 = midsA.exists(onPolyline(lb, _)))

    case (GLine(pts, _), GPolygon(ring, _)) =>
      val mids = splitMidpoints(pts, ringSegments(ring))
      val ii = mids.exists(insideRing(ring, _))
      val ie = mids.exists(m => !insideRing(ring, m) && !onRing(ring, m))
      val anyX = ii || !ie || pts.exists(p => insideRing(ring, p) || onRing(ring, p)) ||
        mids.exists(onRing(ring, _))
      Rel(ii = ii, any = anyX, ie = ie, ei = true)
    case (_: GPolygon, _: GLine) => relate(b, a).mirror

    case (GPolygon(ra, _), GPolygon(rb, _)) =>
      val properCross = ringSegments(ra).exists { case (s1, s2) =>
        ringSegments(rb).exists { case (t1, t2) =>
          segIntersections(s1, s2, t1, t2).exists(x =>
            orient(s1, s2, t1) * orient(s1, s2, t2) < 0 &&
            orient(t1, t2, s1) * orient(t1, t2, s2) < 0) } }
      val aInB = ra.exists(insideRing(rb, _))
      val bInA = rb.exists(insideRing(ra, _))
      val repA = interiorPoint(ra); val repB = interiorPoint(rb)
      val ii = properCross || aInB || bInA ||
        insideRing(rb, repA) || insideRing(ra, repB)
      val anyX = ii || ra.exists(onRing(rb, _)) || rb.exists(onRing(ra, _)) ||
        ringSegments(ra).exists { case (s1, s2) => ringSegments(rb).exists { case (t1, t2) =>
          segIntersections(s1, s2, t1, t2).nonEmpty } }
      // A interior escapes B unless A ⊆ closure(B)
      val aSubB = !properCross && ra.forall(p => insideRing(rb, p) || onRing(rb, p)) &&
        insideRing(rb, repA)
      val bSubA = !properCross && rb.forall(p => insideRing(ra, p) || onRing(ra, p)) &&
        insideRing(ra, repB)
      Rel(ii = ii, any = anyX, ie = !aSubB, ei = !bSubA)
  }

  private implicit class RelOps(private val r: Rel) extends AnyVal {
    def mirror: Rel = Rel(r.ii, r.any, r.ei, r.ie, r.ii1)
  }

  /** Point-set equality. */
  def equalsGeom(a: Geom, b: Geom): Boolean = (a, b) match {
    case (GPoint(p, _), GPoint(q, _)) => samePt(p, q)
    case _ =>
      val r = relate(a, b)
      r.any && !r.ie && !r.ei && (a match {
        case _: GPolygon => r.ii
        case _ => true
      })
  }

  // --------------------------------------------------------------- predicates

  /** The sf* predicates; None = different CRS (GeoSPARQL: incomparable). */
  def predicate(name: String, a: Geom, b: Geom): Option[Boolean] = {
    if (a.crs != b.crs) return None
    val r = relate(a, b)
    def dim(g: Geom) = g match {
      case _: GPoint => 0
      case _: GLine => 1
      case _: GPolygon => 2
    }
    Some(name match {
      case "sfEquals" => equalsGeom(a, b)
      case "sfDisjoint" => !r.any
      case "sfIntersects" => r.any
      case "sfTouches" => r.any && !r.ii
      case "sfContains" => r.ii && !r.ei
      case "sfWithin" => r.ii && !r.ie
      case "sfCrosses" =>
        // line/line: OGC requires dim(I∩I) = 0 — crossing points only
        if (dim(a) == dim(b) && dim(a) == 1) r.ii && !r.ii1 && r.ie && r.ei
        else if (dim(a) < dim(b)) r.ii && r.ie
        else if (dim(a) > dim(b)) r.ii && r.ei
        else false
      case "sfOverlaps" =>
        // curve/curve overlap requires a 1-dim shared run (dim(I∩I) = 1)
        if (dim(a) == dim(b) && dim(a) == 1) r.ii1 && r.ie && r.ei
        else dim(a) == dim(b) && r.ii && r.ie && r.ei
      case other => throw new IllegalArgumentException(s"unknown predicate $other")
    })
  }
}
