package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.encoding.TermCols
import graft.model.{Rdf => RdfNs, Xsd}

/**
 * Deterministic BSBM-shaped dataset generator (Berlin SPARQL Benchmark
 * schema: products / producers / product types / product features /
 * vendors / offers / reviews / reviewers), sized by `nProducts` with the
 * standard BSBM ratios (~20 offers and ~10 reviews per product). The
 * reference benches BSBM Explore+BI over data from the upstream BSBM
 * generator (downloaded at bench time — not available offline), so exact
 * value parity is impossible; this generator reproduces the SCHEMA, the
 * instance-IRI scheme, and enough popularity skew that every one of the
 * reference's adapted query texts
 * (/root/reference/bench/tests/query_results/queries/{explore,bi}-*.sparql)
 * executes and selects non-trivial rows. All choices are md5-hash-driven —
 * fully deterministic, engine-portable, and generated as column
 * expressions over `spark.range` (no driver-side loops; scales linearly
 * with nProducts across the cluster).
 *
 * The producer/vendor/rating-site segmentation of the instance ids is
 * arranged so every concrete IRI the adapted queries mention exists:
 * Products 272@6, 296@7, 578@12, 636@13, 637@14, 801@17, 890@19
 * (producer segments), dataFromVendor1/Offer1250, dataFromVendor5/
 * Offer9035, dataFromRatingSite1/Review4194, ProductType up to 141,
 * ProductFeature up to 4393.
 */
object BsbmGen {

  val Inst = "http://www4.wiwiss.fu-berlin.de/bizer/bsbm/v01/instances/"
  val Voc = "http://www4.wiwiss.fu-berlin.de/bizer/bsbm/v01/vocabulary/"
  val Rdfs = "http://www.w3.org/2000/01/rdf-schema#"
  val Dc = "http://purl.org/dc/elements/1.1/"
  val Rev = "http://purl.org/stuff/rev#"
  val Foaf = "http://xmlns.com/foaf/0.1/"
  val Countries = "http://downlode.org/rdf/iso-3166/countries#"

  private val CountryList = Seq("US", "DE", "AT", "GB", "FR", "ES", "RU", "KR", "CN", "JP")
  private val Words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa")

  val NumTypes = 150       // adapted queries reference types up to 141
  val NumFeatures = 4500   // and features up to 4393

  /** Leaf types the adapted queries filter on — boosted so type-filtered
    * queries select non-trivial product sets (the upstream generator's type
    * hierarchy produces the same effect: leaf types of referenced products
    * carry many products). 4% each, remainder uniform. */
  val HotTypes = Seq(1, 4, 48, 56, 85, 111, 141)

  /** (type, feature, probability): the adapted explore queries pair concrete
    * types with concrete features (upstream, features are inherited from the
    * type hierarchy, so a type's features are common among its products). */
  val TypeFeatures = Seq((56, 1645, 0.6), (56, 8, 0.6), (141, 4393, 0.6),
    (141, 1453, 0.3), (85, 2594, 0.6), (85, 24, 0.5))

  // --------------------------------------------------------- hash utilities

  private def u40(key: Column): Column =
    (conv(substring(md5(key), 1, 10), 16, 10).cast(DoubleType) + lit(0.5)) / lit(1099511627776.0)

  /** Uniform integer in [0, m) from a salted hash of the id. */
  private def hmod(salt: String, id: Column, m: Int): Column =
    pmod(conv(substring(md5(concat(lit(salt + "|"), id)), 1, 10), 16, 10).cast(LongType), lit(m.toLong))

  private def pick(salt: String, id: Column, xs: Seq[String]): Column =
    element_at(typedlit(xs), (hmod(salt, id, xs.size) + 1).cast(IntegerType))

  /** BSBM's country distribution is US-heavy (upstream: US 40%, rest split);
    * explore-q10/bi-q7 filter on the US vendor country. */
  private def pickCountry(salt: String, id: Column): Column = {
    val h = hmod(salt, id, 20)
    when(h < 8, lit("US"))
      .otherwise(element_at(typedlit(CountryList.drop(1)), (pmod(h - 8, lit(9L)) + 1).cast(IntegerType)))
  }

  /** BSBM's varied producer sizes, fixed so the adapted queries' concrete
    * product IRIs land in the right dataFromProducerN segment. */
  def producerOf(id: Column): Column =
    when(id <= 276, ceil(id.cast(DoubleType) / 46.0).cast(LongType))
      .when(id <= 321, lit(7L))
      .when(id <= 581, lit(8L) + floor((id - 322).cast(DoubleType) / 52.0).cast(LongType))
      .when(id <= 636, lit(13L))
      .when(id <= 682, lit(14L))
      .when(id <= 762, lit(15L) + floor((id - 683).cast(DoubleType) / 40.0).cast(LongType))
      .when(id <= 802, lit(17L))
      .when(id <= 847, lit(18L))
      .when(id <= 892, lit(19L))
      .otherwise(lit(20L) + floor((id - 893).cast(DoubleType) / 48.0).cast(LongType))

  // ------------------------------------------------------------ quad builder

  private val g = lit(null).cast(TermCols.schema)
  private def q(s: Column, p: String, o: Column): Seq[Column] =
    Seq(g.as("graph"), TermCols.iri(s).as("subject"),
      TermCols.iri(lit(p)).as("predicate"), o.as("object"))
  private def iriO(c: Column): Column = TermCols.iri(c)
  private def strO(c: Column): Column = TermCols.str(c)
  private def langO(c: Column, lang: Column): Column =
    TermCols.literal(c, lit(RdfNs.langString), lang)
  private def intO(c: Column): Column = TermCols.fromLongRaw(c.cast(LongType))
  private def dblO(c: Column): Column = TermCols.fromDoubleRaw(c.cast(DoubleType))
  private def dtO(c: Column): Column = TermCols.typedLit(c, Xsd.dateTime)
  private def dateO(c: Column): Column = TermCols.typedLit(c, Xsd.date)

  /** "2008-MM-DDT00:00:00" from a day-of-year in [0, 360). */
  private def date2008(day: Column): Column = {
    val m = floor(day.cast(DoubleType) / 30.0).cast(IntegerType) + 1
    val d = (day % 30).cast(IntegerType) + 1
    concat(lit("2008-"), lpad(m.cast(StringType), 2, "0"), lit("-"),
      lpad(d.cast(StringType), 2, "0"), lit("T00:00:00"))
  }

  /** "2007-MM-DD" (xsd:date lexical) from a day-of-year in [0, 360) —
    * publish dates; spans bi-q3's 2007-09..2007-11 windows. */
  private def date2007(day: Column): Column = {
    val m = floor(day.cast(DoubleType) / 30.0).cast(IntegerType) + 1
    val d = (day % 30).cast(IntegerType) + 1
    concat(lit("2007-"), lpad(m.cast(StringType), 2, "0"), lit("-"),
      lpad(d.cast(StringType), 2, "0"))
  }

  // ----------------------------------------------------------------- quads

  def quads(spark: SparkSession, nProducts: Int): DataFrame = {
    require(nProducts >= 1000, "adapted queries reference products up to id 890")
    val n = nProducts.toLong
    val nOffers = 20L * n
    val nReviews = 10L * n
    val nReviewers = math.max(n / 2, 100L)
    val nVendors = (nOffers - 1) / 2000 + 1
    val nProducers = 20 + (n - 899) / 48 + 1

    def range(m: Long) = spark.range(1, m + 1).select(col("id"))
    def union(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionAll _)
    /** Keep a row with probability p (hash-driven). */
    def maybe(salt: String, id: Column, p: Double): Column = u40(concat(lit(salt + "|"), id)) < lit(p)

    // ---- product types: t a bsbm:ProductType, label
    val types = range(NumTypes)
    val typeIri = concat(lit(Inst + "ProductType"), col("id"))
    val typeQuads = Seq(
      types.select(q(typeIri, RdfNs.type_, iriO(lit(Voc + "ProductType"))): _*),
      types.select(q(typeIri, Rdfs + "label",
        strO(concat(lit("Type "), col("id"), lit(" "), pick("tw", col("id"), Words)))): _*))

    // ---- product features: label
    val feats = range(NumFeatures)
    val featIri = concat(lit(Inst + "ProductFeature"), col("id"))
    val featQuads = Seq(
      feats.select(q(featIri, Rdfs + "label",
        strO(concat(lit("Feature "), col("id"), lit(" "), pick("fw", col("id"), Words)))): _*))

    // ---- producers: label, comment, homepage, country
    val producers = range(nProducers)
    val prodrIri = concat(lit(Inst + "dataFromProducer"), col("id"), lit("/Producer"), col("id"))
    val producerQuads = Seq(
      producers.select(q(prodrIri, Rdfs + "label",
        strO(concat(lit("Producer "), col("id"), lit(" "), pick("pw", col("id"), Words)))): _*),
      producers.select(q(prodrIri, Rdfs + "comment",
        strO(concat(lit("A producer of fine goods #"), col("id")))): _*),
      producers.select(q(prodrIri, Foaf + "homepage",
        iriO(concat(lit("http://producer"), col("id"), lit(".example.com/")))): _*),
      producers.select(q(prodrIri, Voc + "country",
        iriO(concat(lit(Countries), pickCountry("pc", col("id"))))): _*))

    // ---- products
    val products = range(n).withColumn("producer", producerOf(col("id")))
    val productIri = concat(lit(Inst + "dataFromProducer"), col("producer"),
      lit("/Product"), col("id"))
    val productProducerIri = concat(lit(Inst + "dataFromProducer"), col("producer"),
      lit("/Producer"), col("producer"))
    // 4% per hot type, remainder uniform over all 150
    val hotPick = hmod("ptypeh", col("id"), 100)
    val leafType = when(hotPick < HotTypes.size * 4,
        element_at(typedlit(HotTypes.map(_.toLong)), (hotPick / 4 + 1).cast(IntegerType)))
      .otherwise(hmod("ptype", col("id"), NumTypes) + 1)
    // feature popularity skew (BSBM's type-hierarchy feature inheritance
    // makes low-id features very common): hot features + per-type pool
    val hotFeatures: Seq[(Int, Double)] =
      Seq(8 -> 0.25, 24 -> 0.2, 1453 -> 0.1, 1645 -> 0.125, 2594 -> 0.1, 4393 -> 0.1) ++
        (1 to 6).map(f => f -> 0.2)
    val poolFeature = (slot: Int) =>
      lit(500L) + hmod(s"pf$slot", col("id"), NumFeatures - 500)
    val productQuads = Seq(
      products.select(q(productIri, RdfNs.type_, iriO(lit(Voc + "Product"))): _*),
      products.select(q(productIri, RdfNs.type_,
        iriO(concat(lit(Inst + "ProductType"), leafType))): _*),
      products.select(q(productIri, Rdfs + "label",
        strO(concat(pick("plw", col("id"), Words), lit(" product "), col("id")))): _*),
      products.select(q(productIri, Rdfs + "comment",
        strO(concat(lit("A very fine product number "), col("id"), lit(" indeed")))): _*),
      products.select(q(productIri, Voc + "producer", iriO(productProducerIri)): _*),
      products.select(q(productIri, Dc + "publisher", iriO(productProducerIri)): _*)) ++
      (1 to 5).map { i =>
        val base = products.select(col("id"), col("producer"),
          (hmod(s"pn$i", col("id"), 2000) + 1).as("v"))
        val filtered = if (i >= 4) base.where(maybe(s"pnopt$i", col("id"), if (i == 4) 0.6 else 0.5))
                       else base
        filtered.select(q(productIri, Voc + s"productPropertyNumeric$i", intO(col("v"))): _*)
      } ++
      (1 to 5).map { i =>
        val base = products.select(col("id"), col("producer"),
          concat(pick(s"pt$i", col("id"), Words), lit(s" text $i of product "), col("id")).as("v"))
        val filtered = if (i >= 4) base.where(maybe(s"ptopt$i", col("id"), if (i == 4) 0.6 else 0.3))
                       else base
        filtered.select(q(productIri, Voc + s"productPropertyTextual$i", strO(col("v"))): _*)
      } ++
      hotFeatures.map { case (f, p) =>
        products.where(maybe(s"hf$f", col("id"), p))
          .select(q(productIri, Voc + "productFeature", iriO(lit(Inst + s"ProductFeature$f"))): _*)
      } ++
      TypeFeatures.map { case (t, f, p) =>
        products.where(leafType === t && maybe(s"tf${t}_$f", col("id"), p))
          .select(q(productIri, Voc + "productFeature", iriO(lit(Inst + s"ProductFeature$f"))): _*)
      } ++
      (1 to 12).map { slot =>
        products.select(q(productIri, Voc + "productFeature",
          iriO(concat(lit(Inst + "ProductFeature"), poolFeature(slot)))): _*)
      }

    // ---- vendors
    val vendors = range(nVendors)
    val vendorIri = concat(lit(Inst + "dataFromVendor"), col("id"), lit("/Vendor"), col("id"))
    val vendorQuads = Seq(
      vendors.select(q(vendorIri, Rdfs + "label",
        strO(concat(lit("Vendor "), col("id"), lit(" "), pick("vw", col("id"), Words)))): _*),
      vendors.select(q(vendorIri, Rdfs + "comment",
        strO(concat(lit("A vendor of many things #"), col("id")))): _*),
      vendors.select(q(vendorIri, Foaf + "homepage",
        iriO(concat(lit("http://vendor"), col("id"), lit(".example.com/")))): _*),
      vendors.select(q(vendorIri, Voc + "country",
        iriO(concat(lit(Countries), pickCountry("vc", col("id"))))): _*))

    // ---- offers: 2000 per dataFromVendor segment. Product popularity is
    // two-tier (head 70% of products share 95% of offers): the tail products
    // with only a few offers are what bi-q7's NOT EXISTS(US vendor) selects.
    val headN = (nProducts * 7) / 10
    val offers = range(nOffers)
      .withColumn("vendor", floor((col("id") - 1) / lit(2000.0)).cast(LongType) + 1)
      .withColumn("productId",
        when(hmod("opt", col("id"), 20) < 19, hmod("op", col("id"), headN) + 1)
          .otherwise(lit(headN.toLong) + hmod("op2", col("id"), nProducts - headN) + 1))
    val offerIri = concat(lit(Inst + "dataFromVendor"), col("vendor"), lit("/Offer"), col("id"))
    val offerVendorIri = concat(lit(Inst + "dataFromVendor"), col("vendor"),
      lit("/Vendor"), col("vendor"))
    val offerProductIri = concat(lit(Inst + "dataFromProducer"), producerOf(col("productId")),
      lit("/Product"), col("productId"))
    val offerQuads = Seq(
      offers.select(q(offerIri, RdfNs.type_, iriO(lit(Voc + "Offer"))): _*),
      offers.select(q(offerIri, Voc + "product", iriO(offerProductIri)): _*),
      offers.select(q(offerIri, Voc + "vendor", iriO(offerVendorIri)): _*),
      offers.select(q(offerIri, Dc + "publisher", iriO(offerVendorIri)): _*),
      // price is a bsbm:USD-typed literal (the adapted queries cast it via
      // xsd:double(STR(?price)) / xsd:float(xsd:string(?price)) precisely
      // because of this — see the reference's Explore Q10 snapshot)
      offers.select(q(offerIri, Voc + "price",
        TermCols.typedLit(
          (u40(concat(lit("price|"), col("id"))) * lit(9990.0) + lit(5.0))
            .cast(DecimalType(10, 2)).cast(StringType),
          Voc + "USD")): _*),
      offers.select(q(offerIri, Voc + "deliveryDays",
        intO(hmod("dd", col("id"), 14) + 1)): _*),
      // validTo skews late (days 120..359 of 2008): explore-q10 keeps only
      // offers valid past 2008-06-20
      offers.select(q(offerIri, Voc + "validTo",
        dtO(date2008(lit(120L) + hmod("vt", col("id"), 240)))): _*),
      offers.select(q(offerIri, Voc + "offerWebpage",
        iriO(concat(lit("http://vendor"), col("vendor"), lit(".example.com/offers/"), col("id")))): _*))

    // ---- reviewers: 250 per dataFromRatingSite segment
    val reviewers = range(nReviewers)
      .withColumn("site", floor((col("id") - 1) / lit(250.0)).cast(LongType) + 1)
    val reviewerIri = concat(lit(Inst + "dataFromRatingSite"), col("site"),
      lit("/Reviewer"), col("id"))
    val reviewerQuads = Seq(
      reviewers.select(q(reviewerIri, Foaf + "name",
        strO(concat(pick("rn", col("id"), Words), lit(" "), pick("rn2", col("id"), Words),
          lit(" "), col("id")))): _*),
      reviewers.select(q(reviewerIri, Voc + "country",
        iriO(concat(lit(Countries), pickCountry("rc", col("id"))))): _*))

    // ---- reviews: 5000 per dataFromRatingSite segment
    val reviews = range(nReviews)
      .withColumn("site", floor((col("id") - 1) / lit(5000.0)).cast(LongType) + 1)
      .withColumn("productId", hmod("rp", col("id"), nProducts) + 1)
      .withColumn("reviewerId", hmod("rr", col("id"), nReviewers.toInt) + 1)
    val reviewIri = concat(lit(Inst + "dataFromRatingSite"), col("site"),
      lit("/Review"), col("id"))
    val reviewProductIri = concat(lit(Inst + "dataFromProducer"), producerOf(col("productId")),
      lit("/Product"), col("productId"))
    val reviewReviewerIri = concat(lit(Inst + "dataFromRatingSite"),
      floor((col("reviewerId") - 1) / lit(250.0)).cast(LongType) + 1,
      lit("/Reviewer"), col("reviewerId"))
    val reviewLang = when(u40(concat(lit("rl|"), col("id"))) < 0.8, lit("en"))
      .otherwise(pick("rl2", col("id"), Seq("de", "fr", "es", "ja", "zh")))
    val reviewQuads = Seq(
      reviews.select(q(reviewIri, Voc + "reviewFor", iriO(reviewProductIri)): _*),
      reviews.select(q(reviewIri, Rev + "reviewer", iriO(reviewReviewerIri)): _*),
      reviews.select(q(reviewIri, Dc + "title",
        strO(concat(lit("Review "), col("id"), lit(": "), pick("rt", col("id"), Words)))): _*),
      reviews.select(q(reviewIri, Rev + "text",
        langO(concat(lit("This product is "), pick("rx", col("id"), Words),
          lit(" and "), pick("ry", col("id"), Words), lit(".")), reviewLang)): _*),
      reviews.select(q(reviewIri, Voc + "reviewDate",
        dtO(date2008(hmod("rd", col("id"), 360)))): _*),
      reviews.select(q(reviewIri, Dc + "date",
        dateO(date2007(hmod("rdd", col("id"), 360)))): _*)) ++
      (1 to 4).map { i =>
        reviews.where(maybe(s"ropt$i", col("id"), 0.7))
          .select(q(reviewIri, Voc + s"rating$i", intO(hmod(s"rv$i", col("id"), 10) + 1)): _*)
      }

    // an RDF graph is a SET of triples: the hot-feature and type-feature
    // rules can emit the same productFeature triple twice — dedup, or BGP
    // join multiplicities diverge from any real store's
    union(typeQuads ++ featQuads ++ producerQuads ++ productQuads ++
      vendorQuads ++ offerQuads ++ reviewerQuads ++ reviewQuads)
      .dropDuplicates()
  }
}
