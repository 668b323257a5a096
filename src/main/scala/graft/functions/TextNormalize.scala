package graft.functions

import java.util.regex.Pattern

/** Word-normalization pipeline for full-text search — behavioral
  * re-implementation of the reference's normalizer
  * (littletable.py:1616-1699; tables at littletable.py:327-379):
  * lowercase, strip surrounding non-word chars, stopword removal,
  * irregular-plural lookup + plural-pattern singularization (yielding BOTH
  * singular and original), acronym collapse ("i.b.m." → "ibm"),
  * hyphen-split, and significant code-doc endings (error/warning/
  * exception).
  *
  * Pure Scala — exposed to Spark as the codegen'd `NormalizeWords`
  * expression ([[graft.functions.TextHashExpressions]]), keeping the
  * search pipeline inside whole-stage codegen end to end.
  */
object TextNormalize {

  /** Default English stopword list (littletable.py:327-343). */
  val stopwords: Set[String] = (
    """a about above after again against all am an and any are aren't as at be because been
       before being below between both but by can't cannot could couldn't did didn't do does
       doesn't doing don't down during each few for from further had hadn't has hasn't have haven't
       having he he'd he'll he's her here here's hers herself him himself his how how's i i'd i'll
       i'm i've if in into is isn't it it's its itself let's me more most mustn't my myself no nor
       not of off on once only or other ought our ours ourselves out over own same shan't she she'd
       she'll she's should shouldn't so some such than that that's the their theirs them themselves
       then there there's these they they'd they'll they're they've this those through to too under
       until up very was wasn't we we'd we'll we're we've were weren't what what's when when's
       where where's which while who who's whom why why's with won't would wouldn't you
       you'd you'll you're you've your yours yourself yourselves""".split("\\s+").toSet
      ++ "d ll m re s t ve".split(" ").toSet + ""
  )

  /** Irregular plural → singular (littletable.py:346-369), plus
    * singulars-that-look-like-plurals mapped to themselves. */
  val pluralsMap: Map[String, String] = Map(
    "addenda" -> "addendum", "addendums" -> "addendum", "alumnae" -> "alumna",
    "alumni" -> "alumnus", "analyses" -> "analysis", "antennae" -> "antenna",
    "antennas" -> "antenna", "antitheses" -> "antithesis", "appendices" -> "appendix",
    "appendixes" -> "appendix", "bacilli" -> "bacillus", "bacteria" -> "bacterium",
    "cacti" -> "cactus", "calves" -> "calf", "children" -> "child", "corpora" -> "corpus",
    "crises" -> "crisis", "criteria" -> "criterion", "curricula" -> "curriculum",
    "diagnoses" -> "diagnosis", "dice" -> "die", "dwarves" -> "dwarf", "dwarfs" -> "dwarf",
    "elves" -> "elf", "ellipses" -> "ellipsis", "errata" -> "erratum",
    "firemen" -> "fireman", "foci" -> "focus", "feet" -> "foot", "formulae" -> "formula",
    "fungi" -> "fungus", "genera" -> "genus", "geese" -> "goose", "halves" -> "half",
    "hooves" -> "hoof", "hypotheses" -> "hypothesis", "indices" -> "index",
    "indexes" -> "index", "knives" -> "knife", "larvae" -> "larva", "leaves" -> "leaf",
    "lives" -> "life", "loaves" -> "loaf", "loci" -> "locus", "lice" -> "louse",
    "men" -> "man", "matrices" -> "matrix", "media" -> "medium",
    "memoranda" -> "memorandum", "minutiae" -> "minutia", "mice" -> "mouse",
    "nebulae" -> "nebula", "nuclei" -> "nucleus", "oases" -> "oasis", "opera" -> "opus",
    "ova" -> "ovum", "oxen" -> "ox", "parentheses" -> "parenthesis",
    "phenomena" -> "phenomenon", "phyla" -> "phylum", "quizzes" -> "quiz",
    "radii" -> "radius", "referenda" -> "referendum", "scarves" -> "scarf",
    "selves" -> "self", "shelves" -> "shelf", "staves" -> "staff",
    "stimuli" -> "stimulus", "strata" -> "stratum", "syllabi" -> "syllabus",
    "symposia" -> "symposium", "synopses" -> "synopsis", "tableaux" -> "tableau",
    "theses" -> "thesis", "thieves" -> "thief", "teeth" -> "tooth",
    "vertebrae" -> "vertebra", "vertices" -> "vertex", "vitae" -> "vita",
    "vortices" -> "vortex", "wharves" -> "wharf", "wives" -> "wife",
    "wolves" -> "wolf", "women" -> "woman"
  ) ++ Seq(
    "rabies", "scabies", "caries", "aries", "series", "billiards", "grits", "pliers",
    "whereabouts", "jeans", "binoculars", "scissors", "tidings", "trousers", "clothes",
    "news", "measles", "mumps", "calculus", "molasses", "tweezers", "dominoes", "pants",
    "odds", "riches", "alms", "barracks", "chassis", "corps", "headquarters", "ides",
    "kudos", "species").map(s => s -> s)

  /** Significant code/doc word endings (littletable.py:371-375). */
  val significantEndings: Seq[String] = Seq("error", "warning", "exception")

  private val NonWordStripper = Pattern.compile("^[^\\w_]?([\\w._-]*)")
  private val SignificantEnding =
    Pattern.compile(s"^[a-z]{2,}(${significantEndings.mkString("|")})$$")

  /** The significant ending of `word`, if the word is a longer term ending
    * in error/warning/exception (littletable.py:1600 regex). */
  def significantEndingOf(word: String): Option[String] = {
    val m = SignificantEnding.matcher(word)
    if (m.matches()) Some(m.group(1)) else None
  }

  // Plural-pattern substitutions, tried in order; the FIRST that matches
  // decides the singular (littletable.py:1602-1614).
  private val PluralIes = ("(.*[^aeiouy])ies$".r, "$1y")
  private val PluralEs = ("(.*(?:ch|ss|sh|x))es$".r, "$1")
  private val PluralEs2 = ("(.*(?:[bcdfghklmnprstuvwxz]|(?:qu))e)s$".r, "$1")
  private val SingularNessIcs = ("(.*(?:ness|ics))$".r, "$1")
  private val PluralS = ("(.*[^aeious])s$".r, "$1")
  private val pluralSubs = Seq(PluralIes, PluralEs, PluralEs2, SingularNessIcs, PluralS)

  private val RstripChars: Set[Char] = ",.!?;:'\"-".toSet

  /** Normalize one raw token into zero or more index words
    * (littletable.py:1634-1699 `_normalize_word_gen`). */
  def normalizeWordGen(raw: String, sw: Set[String] = stopwords): Seq[String] = {
    var s = raw.toLowerCase
    if (sw(s)) return Nil

    // strip non-word chars from front and back
    val m = NonWordStripper.matcher(s)
    s = if (m.lookingAt()) m.group(1) else ""
    if (sw(s)) return Nil

    val sa = s.reverse.dropWhile(RstripChars).reverse
    if (sa.nonEmpty && sa.forall(_.isLetter)) {
      // alphabetic word: plural handling + significant endings
      s = sa
      if (sw(s)) return Nil
      val word = s
      val singular = pluralsMap.getOrElse(word, {
        pluralSubs.collectFirst {
          case (re, repl) if re.findFirstIn(word).isDefined =>
            re.replaceAllIn(word, repl)
        }.getOrElse(word)
      })
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      if (singular.nonEmpty && singular != word) out += singular
      out += word
      if (significantEndings.exists(word.endsWith)) {
        val sm = SignificantEnding.matcher(word)
        if (sm.matches()) out += sm.group(1)
      }
      out.toSeq
    } else {
      // non-alphabetic: dotted acronyms collapse, hyphen parts split
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (sep <- Seq('.', '-')) {
        if (s.contains(sep)) {
          val parts = s.split(Pattern.quote(sep.toString), -1)
          out ++= parts.filter(_.length > 1)
          if (sep == '.' && parts.forall(_.length <= 1))
            out += s.replace(".", "")
        }
      }
      out += s
      out.filter(_.nonEmpty).toSeq
    }
  }

  /** Normalize whole text: whitespace split then per-token normalize
    * (littletable.py:1694-1699 `_normalize_split`). */
  def normalizeSplit(text: String, sw: Set[String] = stopwords): Seq[String] =
    if (text == null) Nil
    else text.split("\\s+").toSeq.filter(_.nonEmpty).flatMap(normalizeWordGen(_, sw))
}
