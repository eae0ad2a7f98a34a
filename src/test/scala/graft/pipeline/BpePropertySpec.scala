package graft.pipeline

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the BPE contract (scalacheck, no Spark). */
class BpePropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaChar, 2 -> Gen.numChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', '!', '?', '-', '_', '(', ')'))).map(_.mkString)

  test("asciiLower is idempotent and only touches A-Z") {
    check(Prop.forAll(asciiText) { s =>
      val once = Bpe.asciiLower(s)
      Bpe.asciiLower(once) == once &&
      once.length == s.length &&
      once.zip(s).forall { case (l, o) =>
        if (o >= 'A' && o <= 'Z') l == (o + 32).toChar else l == o
      }
    })
  }

  test("countTokens == tokens.length and both case-insensitive under ASCII fold") {
    check(Prop.forAll(asciiText) { s =>
      Bpe.countTokens(s) == Bpe.tokens(s).length.toLong &&
      Bpe.countTokens(s) == Bpe.countTokens(Bpe.asciiLower(s))
    })
  }

  test("tokens reassemble the pre-token stream: concatenation invariant") {
    // joining a word's tokens with nothing recovers the word — merges
    // only ever concatenate adjacent symbols, never drop or reorder
    val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    check(Prop.forAll(word) { w =>
      Bpe.encodeWord(w).split(" ").mkString == w
    })
  }

  test("token count is additive across a space (pre-tokens never span one)") {
    check(Prop.forAll(asciiText, asciiText) { (a, b) =>
      Bpe.countTokens(a + " " + b) == Bpe.countTokens(a) + Bpe.countTokens(b)
    })
  }

  test("a trained model's merges always reduce (or keep) the corpus token count") {
    // Spark job per case — keep the case count small
    val corpusGen: Gen[List[String]] =
      Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val p = Prop.forAll(corpusGen) { words =>
      val spark = graft.TestSpark.spark
      import spark.implicits._
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val trained = new BpeModel(Bpe.train(docs, numMerges = 3))
      val baseline = new BpeModel(Vector.empty)
      words.forall(w => trained.countTokens(w) <= baseline.countTokens(w))
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }
}
