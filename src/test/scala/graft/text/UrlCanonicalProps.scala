package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SharedSpark

/** Randomized locks on the URL canonicalizer's contract over generated
  * mess: IDEMPOTENCE (a canonical form is a fixpoint — re-canonicalizing
  * changes nothing) and MESS-INVARIANCE (every generated mess variant of
  * one logical URL canonicalizes to the same string as its clean form).
  * Idempotence is the property that makes canonical URLs safe to store
  * and re-process in an incremental crawl pipeline.
  */
object UrlCanonicalProps extends Properties("urlCanonical") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SharedSpark.spark

  private def canon(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    DedupQueries.canonicalizeUrls(spark,
        urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
          .toDF("doc_id", "url"))
      .orderBy($"doc_id").select($"canonical_url").as[String]
      .collect().toSeq
  }

  private val cleanUrl: Gen[(String, String, String, List[String])] = for {
    scheme <- Gen.oneOf("http", "https")
    host <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
    tld <- Gen.oneOf("com", "org", "net")
    segs <- Gen.listOfN(2, Gen.nonEmptyListOf(Gen.alphaNumChar)
      .map(_.take(5).mkString))
    params <- Gen.listOf(Gen.zip(
        Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(4).mkString),
        Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(4).mkString)))
      .map(_.take(3).map { case (k, v) => s"$k=$v" }
        // generated keys must not collide with the tracking prefixes
        .filterNot(p => p.startsWith("utm_") || p.startsWith("fbclid=") ||
          p.startsWith("gclid=") || p.startsWith("ref=")))
  } yield (scheme, s"$host.$tld", "/" + segs.mkString("/"), params)

  private val messed: Gen[(String, String)] = for {
    (scheme, host, path, params) <- cleanUrl
    upScheme <- Gen.oneOf(true, false)
    upHost <- Gen.oneOf(true, false)
    www <- Gen.oneOf(true, false)
    defPort <- Gen.oneOf(true, false)
    trailing <- Gen.oneOf("", "/", "//")
    tracking <- Gen.someOf(Seq("utm_source=g", "utm_medium=m", "fbclid=x",
      "gclid=y", "ref=tw"))
    // Permutations must derive from ScalaCheck's seed (an unseeded
    // scala.util.Random here would make failures unreplayable and
    // re-randomize under shrinking) — draw a Long and seed a local RNG.
    permSeed <- Gen.choose(Long.MinValue, Long.MaxValue)
    frag <- Gen.oneOf("", "#top", "#a1")
  } yield {
    val rng = new scala.util.Random(permSeed)
    val canonicalParams = params.sorted
    val clean = s"$scheme://$host$path" +
      (if (canonicalParams.nonEmpty) "?" + canonicalParams.mkString("&")
       else "")
    val messParams = rng.shuffle(rng.shuffle(params) ++ tracking.toList)
    val mess = (if (upScheme) scheme.toUpperCase else scheme) + "://" +
      (if (www) "www." else "") +
      (if (upHost) host.toUpperCase else host) +
      (if (defPort) { if (scheme == "http") ":80" else ":443" } else "") +
      path + trailing +
      (if (messParams.nonEmpty) "?" + messParams.mkString("&") else "") +
      frag
    (clean, mess)
  }

  property("mess variants canonicalize to the clean form; fixpoint holds") =
    forAll(Gen.listOfN(6, messed)) { pairs =>
      if (pairs.isEmpty) true
      else {
        val cleans = canon(pairs.map(_._1))
        val messes = canon(pairs.map(_._2))
        val twice = canon(messes)
        graft.CacheTracker.releaseAll()
        val invariant = cleans == messes
        val idempotent = twice == messes
        if (!invariant) println(s"mess diverged: ${pairs.map(_._2)
          .zip(cleans.zip(messes)).filter(p => p._2._1 != p._2._2)}")
        if (!idempotent) println(s"not a fixpoint: ${messes.zip(twice)
          .filter(p => p._1 != p._2)}")
        invariant && idempotent
      }
    }
}
