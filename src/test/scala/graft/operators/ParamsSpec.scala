package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class ParamsSpec extends AnyFunSuite {

  test("absent parameters take the reference defaults (10, 0)") {
    assert(Params.pageParams(Map.empty) == ((10, 0)))
  }

  test("present parameters override defaults") {
    assert(Params.pageParams(Map("limit" -> "25", "offset" -> "50")) == ((25, 50)))
  }

  test("non-integer raises the typed error the API layer maps to 400") {
    val e = intercept[Params.BadParam] {
      Params.pageParams(Map("limit" -> "ten"))
    }
    assert(e.name == "limit" && e.raw == "ten")
  }

  test("negative bounds are rejected") {
    intercept[IllegalArgumentException] {
      Params.pageParams(Map("offset" -> "-1"))
    }
  }
}
