package graft.expr

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PQ expression contracts: runtime shape guards (a wrong-shaped input must
  * fail loudly, never read out of bounds into silently wrong distances) and
  * deep-value equality of the codebook field (so two textually identical
  * calls canonicalize equal and Catalyst can CSE them). */
class PqExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // m=2 subspaces, k=4 codes, sub=3 dims — tiny but fully shaped
  private def cbs: Seq[Seq[Seq[Double]]] =
    Seq.tabulate(2, 4, 3)((m, k, j) => (m * 12 + k * 3 + j).toDouble)
  private def cbsArr: Array[Array[Array[Double]]] =
    cbs.map(_.map(_.toArray).toArray).toArray

  test("ADC evaluates well-shaped rows (codegen path)") {
    import spark.implicits._
    val df = Seq((Array(1, 2), Array.tabulate(6)(_.toDouble))).toDF("codes", "q")
    val d = df.select(
      PqAdcDistance.pq_adc_distance(col("codes"), col("q"), cbs).as("d"))
      .head().getDouble(0)
    // subspace 0 centroid for code 1 is (3,4,5) vs query (0,1,2); subspace 1
    // code 2 is (18,19,20) vs (3,4,5) -> 3*9 + 3*225
    assert(d == 3 * 9.0 + 3 * 225.0)
  }

  test("ADC rejects bad code / short codes / short query, not silent garbage") {
    import spark.implicits._
    def fails(codes: Array[Int], q: Array[Double]): Unit = {
      val df = Seq((codes, q)).toDF("codes", "q")
      intercept[Exception] {
        df.select(PqAdcDistance.pq_adc_distance(col("codes"), col("q"), cbs)).collect()
      }
    }
    fails(Array(9, 0), Array.tabulate(6)(_.toDouble)) // code >= k
    fails(Array(-1, 0), Array.tabulate(6)(_.toDouble)) // negative code
    fails(Array(1), Array.tabulate(6)(_.toDouble)) // fewer codes than m
    fails(Array(1, 2), Array.tabulate(4)(_.toDouble)) // query shorter than m*sub
  }

  test("ADC interpreted eval enforces the same contract") {
    val bad = PqAdcDistance(
      Literal.create(Seq(9, 0), ArrayType(IntegerType)),
      Literal.create(Seq.tabulate(6)(_.toDouble), ArrayType(DoubleType)), cbsArr)
    intercept[IllegalArgumentException] { bad.eval(null) }
    val ok = PqAdcDistance(
      Literal.create(Seq(1, 2), ArrayType(IntegerType)),
      Literal.create(Seq.tabulate(6)(_.toDouble), ArrayType(DoubleType)), cbsArr)
    assert(ok.eval(null) == 3 * 9.0 + 3 * 225.0)
  }

  test("identical PQ calls compare equal by deep codebook value (CSE-able)") {
    val in = Literal.create(Seq.tabulate(6)(_.toDouble), ArrayType(DoubleType))
    // two DISTINCT array objects with equal values
    val enc1 = PqEncode(in, cbsArr)
    val enc2 = PqEncode(in, cbsArr)
    assert(enc1 == enc2 && enc1.hashCode == enc2.hashCode)
    assert(enc1.semanticEquals(enc2))
    val codes = Literal.create(Seq(0, 0), ArrayType(IntegerType))
    val adc1 = PqAdcDistance(codes, in, cbsArr)
    val adc2 = PqAdcDistance(codes, in, cbsArr)
    assert(adc1 == adc2 && adc1.hashCode == adc2.hashCode)
    assert(adc1.semanticEquals(adc2))
    // and differing codebooks do NOT compare equal
    val other = cbsArr; other(0)(0)(0) += 1.0
    assert(enc1 != PqEncode(in, other))
  }
}
