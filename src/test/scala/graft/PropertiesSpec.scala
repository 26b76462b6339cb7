package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.JsonUtil
import graft.ops.DocOps

/** Property-based checks (SURVEY.md §5 item 3) for the pure kernels —
  * invariants that must hold for ANY input, not just fixtures.
  * Sampling is driven directly off scalacheck Gens with a fixed seed
  * (scalatestplus isn't in the offline dependency set). */
class PropertiesSpec extends AnyFunSuite {

  private def forSamples[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      g.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced/$n")
  }

  val tokenGen: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  val fieldsGen: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(tokenGen, Gen.asciiPrintableStr))

  test("scopeProject output is always a subset of the input fields") {
    forSamples(Gen.zip(fieldsGen, Gen.option(Gen.listOf(tokenGen)))) {
      case (fields, scope) =>
        val out = DocOps.scopeProject(fields, scope)
        assert(out.toSet.subsetOf(fields.toSet))
        scope.foreach(s => assert(out.keySet.subsetOf(s.toSet)))
    }
  }

  test("scopeProject with None or the full key list is identity") {
    forSamples(fieldsGen) { fields =>
      assert(DocOps.scopeProject(fields, None) == fields)
      assert(DocOps.scopeProject(fields, Some(fields.keys.toSeq)) == fields)
    }
  }

  test("JsonUtil.pretty round-trips through parse (AST fixpoint)") {
    import org.json4s._
    val leaf: Gen[JValue] = Gen.oneOf(
      Gen.alphaNumStr.map(JString(_)),
      Gen.chooseNum(-1000000L, 1000000L).map(l => JInt(BigInt(l))),
      Gen.oneOf(true, false).map(JBool(_)),
      Gen.const(JNull))
    def node(depth: Int): Gen[JValue] =
      if (depth <= 0) leaf
      else Gen.oneOf(leaf,
        Gen.listOfN(2, Gen.zip(tokenGen, node(depth - 1))).map(JObject(_)),
        Gen.listOfN(2, node(depth - 1)).map(JArray(_)))
    forSamples(node(3), 100) { jv =>
      assert(JsonUtil.parse(JsonUtil.pretty(jv)) == jv)
    }
  }

  test("xmlPack wraps every projected field exactly once") {
    forSamples(fieldsGen.suchThat(_.nonEmpty), 100) { fields =>
      val packed = DocOps.xmlPack(fields)
      fields.keys.foreach { k =>
        assert(packed.contains(s"<$k>") && packed.contains(s"</$k>"))
      }
    }
  }

  test("mdRender emits one header per section") {
    forSamples(Gen.listOf(Gen.zip(tokenGen, Gen.alphaNumStr)), 100) { pairs =>
      val md = DocOps.mdRender(pairs)
      val headers = "(?m)^# ".r.findAllIn(md).length
      assert(headers == pairs.length || pairs.isEmpty)
    }
  }

  test("jsonClean is idempotent") {
    forSamples(Gen.asciiPrintableStr) { s =>
      val once = DocOps.jsonClean(s)
      assert(DocOps.jsonClean(once) == once)
    }
  }
}
