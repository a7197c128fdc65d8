package graft

import graft.model._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for schema derivation over random (possibly cyclic)
  * inheritance graphs: termination, no duplicate columns, child-first
  * shadowing. */
class ModelCompilerPropSpec extends AnyFunSuite {

  private val simpleKinds =
    Gen.oneOf("string", "int32", "int64", "double", "boolean")

  private def genModel: Gen[Model] = for {
    nKinds <- Gen.choose(1, 8)
    names = (0 until nKinds).map(i => s"k$i")
    kinds <- Gen.sequence[Seq[Kind], Kind](names.map { n =>
      for {
        nProps <- Gen.choose(0, 5)
        props <- Gen.listOfN(nProps, for {
          pn <- Gen.oneOf("a", "b", "c", "d", "e", "kind")
          pk <- simpleKinds
          syn <- Gen.oneOf(true, false, false)
        } yield Property(pn, pk, synthetic = syn))
        nBases <- Gen.choose(0, 3)
        bases <- Gen.listOfN(nBases, Gen.oneOf(names)) // cycles allowed
      } yield Kind(n, properties = props.distinctBy(_.name), bases = bases)
    })
  } yield Model(kinds.map(k => k.fqn -> k).toMap)

  test("kindProperties terminates, dedups, and keeps own-property positions") {
    val prop = Prop.forAll(genModel) { m =>
      m.kinds.values.forall { k =>
        val props = ModelCompiler.kindProperties(k, m)
        val names = props.map(_.name)
        val own = k.properties.filter(p => !p.synthetic && p.name != "kind")
        names.distinct == names && // no duplicate columns
          !names.contains("kind") && // discriminator dropped
          props.forall(!_.synthetic) && // synthetic dropped
          // every own property appears (possibly with a base's type —
          // parent-wins collision semantics, schema_utils.py:53-56) and
          // own properties keep their declaration order.
          own.forall(p => names.contains(p.name)) &&
          own.map(_.name).filter(names.contains) ==
            names.filter(own.map(_.name).contains)
      }
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("tableSchema always has _id first and carz last") {
    val prop = Prop.forAll(genModel) { m =>
      ModelCompiler.tableKinds(m, baseKinds = Set.empty).forall { k =>
        val fields = ModelCompiler.tableSchema(k, m).fieldNames.toSeq
        fields.head == "_id" &&
          fields.takeRight(4) == Seq("cloud", "account", "region", "zone")
      }
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(100), prop)
    assert(r.passed, r.status.toString)
  }
}
