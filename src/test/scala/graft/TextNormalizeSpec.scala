package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextNormalize

/** Golden tests from the reference's normalization suite
  * (unit_tests.py:3569-3660) — pure Scala, no Spark session. */
class TextNormalizeSpec extends AnyFunSuite {

  val genGoldens: Seq[(String, Seq[String])] = Seq(
    "nochange" -> Seq("nochange"),
    "ToLower" -> Seq("tolower"),
    "I.B.M." -> Seq("i.b.m.", "ibm"),
    "G.E." -> Seq("g.e.", "ge"),
    "A.I." -> Seq("a.i.", "ai"),
    "AI" -> Seq("ai"),
    "M." -> Seq("m"),
    "mm.xyz" -> Seq("mm", "mm.xyz", "xyz"),
    "MM.xyz" -> Seq("mm", "mm.xyz", "xyz"),
    "Threading.isAlive()" -> Seq("isalive", "threading", "threading.isalive"),
    "*xxx-hhh" -> Seq("hhh", "xxx", "xxx-hhh"),
    "+blahFoo" -> Seq("blahfoo"),
    "str.lstrip" -> Seq("lstrip", "str", "str.lstrip"),
    "str.lstrip()" -> Seq("lstrip", "str", "str.lstrip"),
    "self.assertEquals" -> Seq("assertequals", "self", "self.assertequals"),
    "TestCase.assertEquals" -> Seq("assertequals", "testcase", "testcase.assertequals"),
    "unittest.TestCase.assertEquals" ->
      Seq("assertequals", "testcase", "unittest", "unittest.testcase.assertequals"),
    "foxes" -> Seq("fox", "foxes"),
    "churches" -> Seq("church", "churches"),
    "dresses" -> Seq("dress", "dresses"),
    "dress" -> Seq("dress"),
    "bias" -> Seq("bias"),
    "toys" -> Seq("toy", "toys"),
    "babies" -> Seq("babies", "baby"),
    "addenda" -> Seq("addenda", "addendum"),
    "rabies" -> Seq("rabies"),
    "laziness" -> Seq("laziness"),
    "physics" -> Seq("physics"),
    "Python's" -> Seq("python"),
    "ValueError" -> Seq("error", "valueerror"),
    "DeprecationWarning" -> Seq("deprecationwarning", "warning"),
    "CustomException" -> Seq("customexception", "exception"),
    "terror" -> Seq("terror"),
    "error" -> Seq("error"))

  test("normalize_word_gen goldens (reference unit_tests.py:3587-3627)") {
    genGoldens.foreach { case (in, want) =>
      val got = TextNormalize.normalizeWordGen(in, Set.empty).sorted
      assert(got == want, s"input '$in'")
    }
  }

  test("normalize_split goldens (unit_tests.py:3629-3641)") {
    assert(TextNormalize.normalizeSplit("str.lstrip()", Set.empty).toSet.toSeq.sorted ==
      Seq("lstrip", "str", "str.lstrip"))
    assert(TextNormalize.normalizeSplit("str.lstrip() str.rstrip()", Set.empty).toSet.toSeq.sorted ==
      Seq("lstrip", "rstrip", "str", "str.lstrip", "str.rstrip"))
  }

  test("plurals with trailing punctuation (unit_tests.py:3643-3660)") {
    val cases = Seq(
      "I could hear the babies cries." ->
        Seq("babies", "baby", "could", "cries", "cry", "hear", "i", "the"),
      "Who are those babies?" -> Seq("are", "babies", "baby", "those", "who"),
      "Who took the babies' rattles this time?" ->
        Seq("babies", "baby", "rattle", "rattles", "the", "this", "time", "took", "who"),
      "I love these cakes!" -> Seq("cake", "cakes", "i", "love", "these"),
      "When my wife cooks, she bakes." ->
        Seq("bake", "bakes", "cook", "cooks", "my", "she", "when", "wife"),
      "Let's go shopping for antiques!" ->
        Seq("antique", "antiques", "for", "go", "let", "shopping"),
      "This is an antique vase, worth thousands!" ->
        Seq("an", "antique", "is", "this", "thousand", "thousands", "vase", "worth"),
      "When we meet, you are a giant among men." ->
        Seq("a", "among", "are", "giant", "man", "meet", "men", "we", "when", "you"),
      "When we are among men, you are a giant meatball." ->
        Seq("a", "among", "are", "are", "giant", "man", "meatball", "men", "we", "when", "you"))
    cases.foreach { case (line, want) =>
      assert(TextNormalize.normalizeSplit(line, Set.empty).sorted == want, s"line '$line'")
    }
  }

  test("stopwords filter everything stopworded") {
    assert(TextNormalize.normalizeSplit("the a of and") == Nil)
    assert(TextNormalize.normalizeWordGen("The") == Nil)
  }
}
