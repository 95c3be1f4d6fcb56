package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the determinism kernel (SURVEY §5.2):
  * the cents/micros quantizations must be exact inverses on their
  * domains and order-independent under summation — that's the whole
  * basis of the oracle hash-match strategy. Checked on the JVM side
  * only (both engines compute the same IEEE ops; see Det.scala).
  */
object DetProperties extends Properties("Det") {

  // 2-dp money values as the data generator produces them: cents / 100.0
  private val money: Gen[(Long, Double)] =
    Gen.choose(-10000000L, 10000000L).map(c => (c, c / 100.0))

  property("round(x*100) recovers the exact cents") = forAll(money) {
    case (c, x) => math.round(x * 100).toLong == c
  }

  // positive reals with µs precision: micros / 1e6
  private val real: Gen[(Long, Double)] =
    Gen.choose(0L, 2000000000L).map(m => (m, m / 1e6))

  property("round(x*1e6) recovers the exact micros") = forAll(real) {
    case (m, x) => math.round(x * 1e6).toLong == m
  }

  property("integer cent sums are permutation-invariant") =
    forAll(Gen.listOfN(50, Gen.choose(-1000000L, 1000000L))) { cs =>
      cs.sum == scala.util.Random.shuffle(cs).sum
    }

  property("double sums are NOT reliably permutation-invariant (why cents exist)") =
    Prop.exists(Gen.listOfN(30, Gen.choose(-1e15, 1e15))) { ds =>
      val shuffled = scala.util.Random.shuffle(ds)
      ds.sum != shuffled.sum // witnesses the FP-order hazard
    }

  property("Jaccard formula stays in [0,1] and hits 1 only on equality") =
    forAll(Gen.choose(1L, 500L), Gen.choose(1L, 500L)) { (na, nb) =>
      val common = math.min(na, nb)
      val j = common.toDouble / (na + nb - common)
      j >= 0.0 && j <= 1.0 && ((j == 1.0) == (na == nb))
    }
}
