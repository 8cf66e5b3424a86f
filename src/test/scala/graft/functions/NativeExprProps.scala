package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.SharedSpark
import graft.text.NearDup
import graft.vector.VectorOps

/** Property-based equivalence of each native Catalyst expression against
  * the HOF formulation it replaced — the "value-identical, so the DuckDB
  * oracle is unchanged" claim, checked on arbitrary inputs rather than
  * the fixture corpus.
  */
object NativeExprProps extends Properties("native-expressions") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val tokenGen: Gen[List[String]] =
    Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "x1", "y2", "z",
        "lorem", "ipsum", "", "UP", "mixed9")))

  property("word_shingles == HOF on arbitrary token arrays") =
    forAll(Gen.listOfN(25, tokenGen)) { docs =>
      val df = docs.toDF("toks").select(
        NearDup.wordShingles($"toks", 3).as("n"),
        NearDup.wordShinglesHof($"toks", 3).as("h"))
      df.collect().forall(r => r.getSeq[String](0) == r.getSeq[String](1))
    }

  property("minhash_md5 == HOF minhashes on arbitrary shingle sets") =
    forAll(Gen.listOfN(15, tokenGen)) { docs =>
      val df = docs.toDF("sh").select(
        expr("minhash_md5(sh, 6)").as("n"),
        NearDup.minhashes($"sh", 6).as("h"))
      df.collect().forall(r => r.getSeq[String](0) == r.getSeq[String](1))
    }

  private val vecGen: Gen[List[Double]] =
    Gen.choose(1, 48).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-10.0, 10.0)))

  property("dot_exact_dec == HOF decimal kernel on arbitrary double vectors") =
    forAll(Gen.listOfN(20, vecGen)) { vecs =>
      val df = vecs.map(v => (v, v.reverse)).toDF("a", "b").select(
        VectorOps.dotExact($"a", $"b").as("n"),
        VectorOps.dotExactHof($"a", $"b").as("h"))
      df.collect().forall(r => r.getDouble(0) == r.getDouble(1))
    }

  property("dot_double == HOF double fold on arbitrary double vectors") =
    forAll(Gen.listOfN(20, vecGen)) { vecs =>
      val df = vecs.map(v => (v, v.reverse)).toDF("a", "b").select(
        VectorOps.dotFast($"a", $"b").as("n"),
        VectorOps.dotFastHof($"a", $"b").as("h"))
      // bit-identical, not approximately equal: same element order, same
      // IEEE ops — the fold IS the spec
      df.collect().forall(r => r.getDouble(0) == r.getDouble(1))
    }

  property("sign_bits is invariant under positive scaling of the hyperplane family") =
    forAll(Gen.listOfN(10, vecGen.suchThat(_.nonEmpty))) { vecs =>
      // scaling the INPUT is not sign-preserving (fixed-point floor), but
      // the signature must be identical however the rows are partitioned
      val df = vecs.toDF("v")
      val a = df.coalesce(1).select(expr("sign_bits(v, 16)").as("s"))
        .as[String].collect().toSeq
      val b = df.repartition(5).select(expr("sign_bits(v, 16)").as("s"))
        .as[String].collect().toSeq
      a.sorted == b.sorted
    }
}
