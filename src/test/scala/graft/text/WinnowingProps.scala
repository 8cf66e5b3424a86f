package graft.text

import java.security.MessageDigest

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Randomized locks on the winnowing model (the same plain-Scala model
  * WinnowingSpec pins the gate against): the w+k−1 DETECTION GUARANTEE
  * — any two token sequences sharing a contiguous run of ≥ 8 tokens
  * share a fingerprint hash wherever the run is embedded — and the
  * DENSITY bound (at least one fingerprint per window; selected count
  * never exceeds window count). These are the theorems the MOSS paper
  * proves; random embedding offsets and noise vocabularies probe the
  * boundary arithmetic a fixed fixture can't.
  */
object WinnowingProps extends Properties("winnowing") {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def winnow(toks: Seq[String]): Seq[String] = {
    val pgs = (0 to toks.size - 4).map { p =>
      md5hex(toks.slice(p, p + 4).mkString(" ")) + "|" + f"$p%06d"
    }
    (0 to pgs.size - 5).map(s => pgs.slice(s, s + 5).min).distinct
  }

  private val word = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
  private val noise = Gen.listOfN(6, word).map(_.map("n" + _))
  private val run = Gen.choose(8, 14)
    .flatMap(n => Gen.listOfN(n, word).map(_.zipWithIndex
      .map { case (w, i) => s"r${i}_$w" })) // positionally unique run

  property("shared >=8-token runs always share a fingerprint hash") =
    forAll(run, noise, noise, noise, noise) { (r, a, b, c, d) =>
      val d1 = a ++ r ++ b
      val d2 = c ++ r ++ d
      val h1 = winnow(d1).map(_.takeWhile(_ != '|')).toSet
      val h2 = winnow(d2).map(_.takeWhile(_ != '|')).toSet
      h1.intersect(h2).nonEmpty
    }

  property("density: selected in [ceil(windows/w), windows]") =
    forAll(Gen.listOfN(30, word)) { toks =>
      val sel = winnow(toks).size
      val windows = toks.size - 3 - 4
      // every window contributes a min, adjacent windows share at most
      // one — so at least windows/w distinct picks, at most one each
      sel >= (windows + 4) / 5 && sel <= windows
    }
}
