package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text statistics + n-gram language identification.
  *
  * The column-algebra formulations (`size(filter(split(...)))` per
  * metric) are CodegenFallback: every higher-order function runs an
  * interpreted lambda with per-element boxing, and CollapseProject
  * re-inlines the subtree into each consumer — measured 5-10× slower
  * than native expressions on this repo's per-row text paths. At 100 TB
  * the quality/langid scoring IS the pipeline's map-side cost, so both
  * run here as one tight code-point loop per document inside
  * whole-stage codegen.
  *
  * Language ID follows the n-gram profile approach of the reference's
  * LanguageID parse filter (`external/langid/.../LanguageID.java:54`,
  * itself Cavnar–Trenkle style): character trigrams of word-padded
  * lowercase text scored against fixed per-language profiles, plus
  * script-range detection for non-Latin languages. Profiles are
  * deterministic constants, so the DuckDB oracle reproduces every
  * prediction bit-for-bit (the SQL is generated from the same tables).
  */
object TextStatsOps {

  /** One pass over the code points of `text`:
    * [0] n_tokens — maximal runs of non-space (split-on-' ') tokens
    * [1] n_stop — tokens exactly matching the stop set
    * [2] n_punct — code points in `.,!?;:`
    * [3] alnum_tokens — maximal runs of ASCII [A-Za-z0-9]
    * [4] symbol_tokens — code points neither ASCII-alnum nor Java `\s`
    * [5] n_chars — total code points (Spark `length`)
    */
  def textStats(text: UTF8String, stops: java.util.HashSet[String]): ArrayData = {
    if (text == null) return null
    val s = text.toString
    val out = new Array[Long](6)
    var inTok = false
    var inAlnum = false
    val tok = new java.lang.StringBuilder()
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      out(5) += 1
      val isSpace = cp == ' '
      if (!isSpace) {
        if (!inTok) { out(0) += 1; inTok = true }
        tok.appendCodePoint(cp)
      } else if (inTok) {
        if (stops.contains(tok.toString)) out(1) += 1
        tok.setLength(0); inTok = false
      }
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9')
      if (alnum) { if (!inAlnum) { out(3) += 1; inAlnum = true } }
      else inAlnum = false
      if (cp == '.' || cp == ',' || cp == '!' || cp == '?' || cp == ';' || cp == ':')
        out(2) += 1
      if (!alnum && cp != ' ' && cp != '\t' && cp != '\n' && cp != 0x0b &&
          cp != '\f' && cp != '\r')
        out(4) += 1
      i += Character.charCount(cp)
    }
    if (inTok && stops.contains(tok.toString)) out(1) += 1
    new GenericArrayData(out)
  }
}

/** Deterministic language profiles shared by the native expression and
  * the generated DuckDB oracle SQL — single source of truth, so the two
  * engines cannot drift. */
object LangProfiles {

  /** Non-Latin script ranges (lang, loCodePoint, hiCodePoint); a doc
    * whose dominant script covers ≥ `scriptThreshold` of its non-space
    * code points is labeled by script, confidence = that fraction. */
  val scripts: Seq[(String, Int, Int)] = Seq(
    ("am", 0x1200, 0x137f), // Ethiopic
    ("ar", 0x0600, 0x06ff),
    ("bn", 0x0980, 0x09ff),
    ("el", 0x0370, 0x03ff),
    ("gu", 0x0a80, 0x0aff),
    ("he", 0x0590, 0x05ff),
    ("hi", 0x0900, 0x097f),
    ("hy", 0x0530, 0x058f),
    ("ja", 0x3040, 0x30ff),
    ("ka", 0x10a0, 0x10ff),
    ("km", 0x1780, 0x17ff),
    ("kn", 0x0c80, 0x0cff),
    ("ko", 0xac00, 0xd7af),
    ("lo", 0x0e80, 0x0eff),
    ("ml", 0x0d00, 0x0d7f),
    ("my", 0x1000, 0x109f),
    ("pa", 0x0a00, 0x0a7f), // Gurmukhi
    ("ru", 0x0400, 0x04ff),
    ("si", 0x0d80, 0x0dff),
    ("ta", 0x0b80, 0x0bff),
    ("te", 0x0c00, 0x0c7f),
    ("th", 0x0e00, 0x0e7f),
    ("zh", 0x4e00, 0x9fff))

  // overlapping ranges would make "dominant script" ambiguous
  scripts.sortBy(_._2).sliding(2).foreach {
    case Seq((la, _, hiA), (lb, loB, _)) =>
      require(hiA < loB, s"script ranges overlap: $la..$hiA vs $lb..$loB")
    case _ => ()
  }

  val scriptThreshold = 0.3

  /** Member languages disambiguated INSIDE a detected script family:
    * family default language → (member, marker code-point ranges).
    * Markers are characters routine in the member but (near-)absent
    * from the family default and every sibling member — е.g. ї/є are
    * Ukrainian-only within Cyrillic, ے is Urdu-only within
    * Arabic-script, kana is Japanese-only alongside Han. A member
    * claims the doc when its markers cover ≥ [[memberThreshold]] of
    * non-space code points (largest coverage wins, ties language-
    * ascending); otherwise the family default stands. Confidence stays
    * the family-script fraction either way. */
  val members: Map[String, Seq[(String, Seq[(Int, Int)])]] = Map(
    "ru" -> Seq(
      "be" -> Seq(0x045e -> 0x045e), // ў
      "bg" -> Seq(0x044a -> 0x044a), // ъ (rare in ru, routine in bg)
      "mk" -> Seq(0x0453 -> 0x0453, 0x0455 -> 0x0455, 0x045c -> 0x045c), // ѓ ѕ ќ
      "sr" -> Seq(0x0452 -> 0x0452, 0x045b -> 0x045b), // ђ ћ (mk uses ѓ ќ instead)
      "uk" -> Seq(0x0454 -> 0x0454, 0x0457 -> 0x0457, 0x0491 -> 0x0491)), // є ї ґ
    "ar" -> Seq(
      "fa" -> Seq(0x067e -> 0x067e, 0x0686 -> 0x0686, 0x0698 -> 0x0698,
        0x06af -> 0x06af), // پ چ ژ گ (also Urdu, but ur's own markers outscore)
      "ur" -> Seq(0x0679 -> 0x0679, 0x0688 -> 0x0688, 0x0691 -> 0x0691,
        0x06be -> 0x06be, 0x06d2 -> 0x06d2)), // ٹ ڈ ڑ ھ ے
    "zh" -> Seq(
      "ja" -> Seq(0x3040 -> 0x30ff))) // kana: kanji-heavy ja beats 30% han

  // member lists sorted (the oracle mirrors language-ascending ties);
  // markers MAY sit inside tier-1 ranges by design — uk's є/ї/ґ are
  // Cyrillic code points, ja's kana markers double as its own tier-1
  // range (kana-dominant text short-circuits to ja before this tier)
  members.foreach { case (fam, ms) =>
    require(scripts.exists(_._1 == fam), s"member family $fam has no script")
    require(ms.map(_._1) == ms.map(_._1).sorted, s"members of $fam not sorted")
  }

  val memberThreshold = 0.005

  /** Frequent word-padded character trigrams per Latin language, most
    * discriminative first; trigram i carries weight `size - i`. Public
    * frequency knowledge (Cavnar–Trenkle style profiles). */
  val trigrams: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", "nd ", "and", " an", " of", "of ", " to",
      "to ", "ing", "ng ", " in", "in ", "ion", "tio", " is", "is ", "ed ",
      " be", "at ", " it", "it ", "ent", " re", "er ", " ha", "es ", " co", "on "),
    "de" -> Seq("en ", " de", "der", "er ", "ie ", " di", "die", "ch ", "sch",
      " un", "und", "nd ", "ein", " ei", "ich", "cht", " ge", "ung", "ng ",
      "ine", " be", "ver", " ve", "ten", "das", " da", "it ", "mit", " mi", "ist"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", " en", "en ", "el ", " el",
      "es ", " qu", "que", "ue ", " co", "ón ", "ció", "aci", " es", "ado",
      "as ", " lo", "los", " po", "por", "ar ", "nte", " se", "con", " un", "ien"),
    "fr" -> Seq(" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "et ",
      " et", "ion", "tio", " qu", "que", "ue ", "les", " pa", "par", "re ",
      " co", "con", "eur", " po", "nt ", "ur ", "ais", "ait", " un", "une", "our"),
    "it" -> Seq(" di", "di ", " ch", "che", "he ", " co", "con", "to ", " la",
      "la ", "re ", " de", "del", "ell", "lla", " pe", "per", "er ", "one",
      "ion", "zio", "azi", " un", "una", "no ", "ti ", " si", "ato", "nte", " al"),
    "nl" -> Seq("en ", " de", "de ", "et ", " he", "het", " va", "van", "an ",
      " ee", "een", "n d", "er ", " ge", "ijk", "ij ", " zi", "aar", " en",
      "ing", "ng ", " be", "ver", "oor", " vo", "den", "ten", " in", "in ", "cht"),
    "pt" -> Seq(" de", "de ", " qu", "que", "ue ", " co", "os ", "as ", " es",
      "ão ", "ção", " pa", "par", "ra ", "ar ", " do", "do ", "da ", " da",
      "em ", " em", "ent", "nte", " se", "ade", "dad", " po", "or ", "es ", "com"),
    "pl" -> Seq(" ni", "nie", "ie ", " po", " na", "na ", "ch ", " pr", "prz",
      "rze", "ego", "go ", " do", "ści", " za", "owa", "ani", "nia", "ia ",
      " je", "jes", "est", "się", " si", "ych", " w ", " z ", "ej ", "ać ", "ow "),
    "ro" -> Seq(" de", "de ", " în", "în ", "ul ", "are", " ca", "car", "re ",
      "ea ", "și ", " și", "ate", " pe", "pen", "tru", "lor", " co", "con",
      "ui ", "lui", " cu", "cu ", "ste", " ac", "ace", "ilo", "or ", "tă ", "ei "),
    "sv" -> Seq("en ", " de", "det", "et ", " oc", "och", "ch ", " at", "att",
      "tt ", "för", " fö", "ar ", " so", "som", "om ", "er ", " ha", "an ",
      "ing", "ng ", " in", "de ", " ti", "til", "ill", " me", "med", "ed ", "lla"),
    "da" -> Seq("er ", "en ", " de", "det", " at", "at ", " og", "og ", "de ",
      " fo", "for", "or ", " ti", "til", "il ", " me", "med", " ha", "der",
      "nde", "ere", " er", "ing", "ng ", " si", "ig ", "ler", "rne", "ed ", "kke"),
    "no" -> Seq("er ", "en ", " de", "det", "et ", " og", "og ", " ti", "til",
      "il ", " fo", "for", "or ", " ha", "har", "ar ", " ik", "ikk", "kke",
      " so", "som", "om ", "ing", "ng ", " me", "med", " på", "på ", "ene", "ret"),
    "fi" -> Seq("en ", "in ", "an ", " on", "on ", "ist", "sta", " ja", "ja ",
      "aan", "än ", "ään", "lla", "ssa", " ka", " pa", "tta", "ta ", "si ",
      "un ", "ksi", "lle", "itt", "ttä", "tä ", " jo", "oka", "ka ", " se", "sen"),
    "cs" -> Seq(" po", " na", "na ", " je", "je ", "se ", " se", "ní ", "ost",
      " př", "pře", " pr", "pro", "ro ", "ou ", " do", "ho ", "ého", " ne",
      "la ", "le ", " za", "ce ", "em ", " kt", "kte", "ter", "ých", "ně ", "ři "),
    "hu" -> Seq(" a ", " az", "az ", "el ", " el", "egy", " eg", "gy ", "ek ",
      " me", "meg", "en ", "ség", "ég ", "nek", " ne", "tt ", "ett", " ho",
      "hog", "ogy", " va", "van", "án ", "ban", "ben", " be", "ás ", "és ", " és"),
    "tr" -> Seq(" bi", "bir", "ir ", "lar", "ar ", "ler", "er ", " ka", " ol",
      "ola", "an ", "ın ", "arı", "rı ", " ya", "yor", "or ", " ve", "ve ",
      "in ", "nin", " bu", "bu ", "da ", "de ", "nda", " iç", "içi", "çin", "ını"),
    "id" -> Seq(" me", "men", "an ", "kan", " di", "di ", "ang", "ng ", " ya",
      "yan", "ada", " ad", " be", "ber", "nya", "ya ", " pe", "per", "ara",
      " da", "dan", "dal", "ala", "lam", " se", "seb", "ter", " te", "ata", "tan"),
    "vi" -> Seq("ng ", " ng", "ngư", " th", " nh", "như", " cá", "các", "ác ",
      " là", "là ", " củ", "của", "ủa ", " và", "và ", "ới ", " vớ", "với",
      "ông", " ch", "cho", "ho ", " đư", "đượ", "ợc ", "ên ", "iện", " mộ", "ột "),
    "ca" -> Seq("els", " am", "amb", "mb ", "ció", "ió ", "tat", " se", "sev",
      "eva", " mé", "més", "és ", "nt ", "ant", "men", " aq", "aqu", "que",
      " qu", "per", " pe", "les", " le", "est", " es", "de ", " de", "la ", " la"),
    "af" -> Seq("die", " di", "ie ", "en ", " en", "van", " va", "an ", "het",
      " he", "et ", " ni", "nie", " wa", "wat", "at ", " om", "om ", " te",
      "te ", " ge", "ge ", "ing", "ng ", "vir", " vi", "ir ", "aan", " aa", "eer"),
    "et" -> Seq(" ja", "ja ", " on", "on ", " ei", "ei ", " et", "et ", "see",
      " se", "ee ", " ol", "oli", "li ", " ka", "ka ", "kui", " ku", "ui ",
      "mis", " mi", "is ", "aga", " ag", "ga ", "oma", "ma ", "ud ", "se ", "ele"),
    "eu" -> Seq("eta", " et", "ta ", " da", "da ", " ez", "ez ", "bat", " ba",
      "at ", "ere", " er", "re ", "en ", "ak ", "ean", "an ", "tze", "zen",
      " ze", "iza", " iz", "ko ", " ko", "ien", "rri", "tik", "ela", "dut", "ura"),
    "gl" -> Seq(" de", "de ", " qu", "que", "ue ", "non", " no", "on ", "unh",
      "nha", "ha ", " un", "par", " pa", "ara", "ra ", "con", " co", "os ",
      "as ", "do ", " do", "da ", " da", "ció", "ión", "ón ", "áis", "is ", "se "),
    "hr" -> Seq(" je", "je ", " se", "se ", " na", "na ", " da", "da ", " za",
      "za ", "su ", " su", " od", "od ", "koj", "oji", "ji ", " ko", "što",
      " št", "to ", "ije", "ja ", "og ", " pr", "pro", "ost", "ih ", "ima", "ti "),
    "is" -> Seq(" og", "og ", " að", "að ", " er", "er ", " se", "sem", "em ",
      "um ", "en ", "við", " vi", "ið ", "ekk", "kki", "ki ", " þa", "það",
      "ann", "nn ", "var", " va", "ar ", "til", " ti", "il ", "með", " me", "eð "),
    "lt" -> Seq(" ir", "ir ", "yra", " yr", "ra ", "kad", " ka", "ad ", "tai",
      " ta", "ai ", "su ", " su", "bet", " be", "et ", "aip", "ip ", " iš",
      "iš ", "uvo", "vo ", "as ", "is ", "us ", "tų ", "ių ", "ais", "iau", "mas"),
    "lv" -> Seq(" un", "un ", " ir", "ir ", " ka", "ka ", " ar", "ar ", "par",
      " pa", "as ", "bet", " be", "et ", "kas", "vai", " va", "ai ", " no",
      "no ", " uz", "uz ", "tas", " ta", "ja ", "iem", "em ", " pi", "ies", "ot "),
    "sk" -> Seq(" je", "je ", " sa", "sa ", " na", "na ", " to", "to ", "že ",
      " že", "som", " so", "om ", "ako", " ak", "ko ", "ale", " al", "le ",
      " pr", "pre", "re ", " po", "po ", "kto", "tor", "orý", "rý ", " ne", "ie "),
    "sl" -> Seq(" je", "je ", " in", "in ", " se", "se ", " na", "na ", " da",
      "da ", " za", "za ", "so ", " so", "ki ", " ki", "pa ", " pa", "tud",
      "udi", "di ", " ko", "kot", "ot ", "bi ", " bi", " po", "po ", "nje", "ih "),
    "sq" -> Seq("dhe", " dh", "he ", " të", "të ", " në", "në ", " me", "me ",
      " që", "që ", " pë", "për", "ër ", " ng", "nga", "ga ", " si", "si ",
      "jan", "anë", " ja", "ësh", "sht", "htë", " ës", "ka ", " ka", "uar", "it "),
    "sw" -> Seq(" na", "na ", " ya", "ya ", " wa", "wa ", "kwa", " kw", "ni ",
      " ni", "za ", " za", "kat", "ati", "tik", "ika", " ka", "ku ", " ku",
      "uwa", "ili", " il", "li ", "cha", " ch", "ha ", "ana", "ama", "kut", "mba"),
    "tl" -> Seq("ang", " an", "ng ", " ng", " sa", "sa ", " na", "na ", "mga",
      " mg", "ga ", " ay", "ay ", " at", "at ", "par", "ara", "ra ", "ito",
      " it", "to ", "hin", "ind", "ndi", "di ", " hi", "ako", " ak", "iya", "ya "),
    // round-7 breadth tail (az/cy/eo/ga/ha/la/mt/so): ə-trigrams keep
    // az clear of tr; hyphen trigrams (il-/l-k) are Maltese-only —
    // punctuation survives trigram extraction by design
    "az" -> Seq(" və", "və ", "lər", "ər ", "ın ", "dır", "ır ", " bi", "bir",
      "ir ", "əri", "ri ", " ol", "lar", "ar ", "ən ", "dən", " bu", "bu ",
      "ki ", " ki", "əsi", "si ", "ini", "ni ", "ılı", "lı ", "ünd", "ndə", "də "),
    "cy" -> Seq(" yn", "yn ", " y ", "mae", " ma", "ae ", " ar", "yr ", " yr",
      "edd", "dd ", "wed", "edi", "di ", " we", " bo", "bod", "od ", "gyd",
      " gy", "yda", " ei", "ei ", "eth", "th ", "iad", "ad ", " i ", " o ", "au "),
    "eo" -> Seq(" la", "la ", "kaj", " ka", "aj ", " es", "est", "sta", "tas",
      "as ", " de", "de ", " en", "en ", " al", "al ", " ke", "ke ", "oj ",
      "ojn", "jn ", " mi", "mi ", "on ", "ant", "ata", "ita", "is ", "os ", "ro "),
    "ga" -> Seq("agu", "gus", "us ", " ag", "ag ", " an", "an ", " ar", "ar ",
      " na", "na ", "ach", "ch ", " ch", " go", "go ", " le", "le ", "bhí",
      "hí ", " bh", "atá", "tá ", " at", "adh", "dh ", "ail", "il ", "ear", "nn "),
    "ha" -> Seq(" da", "da ", " ya", "ya ", " ta", "ta ", " ba", "ba ", "mai",
      "ai ", " ma", " ka", "kan", "an ", "wan", "ann", "nan", " wa", " su",
      "suk", "uka", "ka ", "cik", "iki", "kin", " ci", "in ", "kum", "uma", "ma "),
    "la" -> Seq(" et", "et ", "um ", "us ", " in", "in ", "est", " es", "st ",
      "que", " qu", "ue ", "qui", " no", "non", "on ", " ad", "ad ", "cum",
      " cu", "ibu", "bus", "tur", "ur ", "rum", "ere", "nt ", "tis", "iam", "em "),
    "mt" -> Seq(" li", "li ", " ta", "ta ", " il", "il-", "għa", " għ", "ħa ",
      "ija", "ja ", " ma", "ma ", "iet", "et ", "tal", "al ", " fi", "fil",
      "l-k", "jie", "ie ", " hu", "hu ", "wa ", " u ", "lha", "ha ", "zij", "ien"),
    "so" -> Seq("yaa", "aya", " ay", "ay ", "aa ", "wax", " wa", "axa", "xa ",
      " oo", "oo ", " ka", "ka ", " dh", "dha", "aha", "ada", "an ", "aan",
      " ah", "ah ", "uu ", " uu", "iyo", " iy", "yo ", "ood", "ays", "nta", "day"))

  trigrams.foreach { case (l, ts) =>
    require(ts.distinct.size == ts.size, s"duplicate trigram in profile $l")
    require(ts.forall(_.length == 3), s"non-trigram in profile $l")
  }

  val latinLangs: Array[String] = trigrams.keys.toArray.sorted

  /** trigram → weight vector over `latinLangs` (0 where absent). */
  lazy val weightIndex: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    latinLangs.zipWithIndex.foreach { case (lang, li) =>
      val ts = trigrams(lang)
      ts.zipWithIndex.foreach { case (tg, i) =>
        val v = m.computeIfAbsent(tg, _ => new Array[Long](latinLangs.length))
        v(li) = (ts.size - i).toLong
      }
    }
    m
  }
}

object LangIdOps {
  import LangProfiles._

  // flat arrays for the per-code-point script loop (no Seq/tuple overhead)
  private val scriptLo: Array[Int] = scripts.map(_._2).toArray
  private val scriptHi: Array[Int] = scripts.map(_._3).toArray
  // every script range starts at/above this — code points below (all of
  // ASCII/Latin-1) can skip the range loop entirely. For mostly-Latin
  // corpora this removes scripts.length compares per character.
  private val minScriptLo: Int = scriptLo.min

  // The trigram table, packed: 3 code points (≤ 0x10FFFF < 2^21 each)
  // into one Long, open-addressed into parallel arrays. The String-keyed
  // HashMap costs a String ALLOCATION + char-hash per trigram of every
  // document (measured 877 s for 50 M docs at sf1000 — the suite's
  // largest row); the packed probe is two array reads and no allocation.
  // Same weights, same lookups, bit-identical scores.
  private val tgMask: Int = {
    val n = weightIndex.size()
    var cap = 16
    while (cap < n * 4) cap <<= 1
    cap - 1
  }
  private val tgKeys: Array[Long] = Array.fill(tgMask + 1)(-1L)
  private val tgVals: Array[Array[Long]] = new Array[Array[Long]](tgMask + 1)
  locally {
    val it = weightIndex.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val t = e.getKey
      val key = (t.codePointAt(0).toLong << 42) |
        (t.codePointAt(t.offsetByCodePoints(0, 1)).toLong << 21) |
        t.codePointAt(t.offsetByCodePoints(0, 2)).toLong
      var slot = (java.lang.Long.hashCode(key) & tgMask)
      while (tgKeys(slot) != -1L) slot = (slot + 1) & tgMask
      tgKeys(slot) = key
      tgVals(slot) = e.getValue
    }
  }

  /** weight row for packed trigram `key`, or null. */
  private def tgLookup(key: Long): Array[Long] = {
    var slot = (java.lang.Long.hashCode(key) & tgMask)
    while (true) {
      val k = tgKeys(slot)
      if (k == key) return tgVals(slot)
      if (k == -1L) return null
      slot = (slot + 1) & tgMask
    }
    null
  }

  /** (language, confidence) for a document, or ("und", 0.0).
    * Decision order (mirrored exactly by the SQL oracle):
    * 1. dominant non-Latin script ≥ 30% of non-space code points →
    *    that family's language, confidence = fraction (ties: lang
    *    asc); 1b. if the family has member languages, the member
    *    whose marker code points cover ≥ 0.5% of non-space code
    *    points (largest coverage, ties lang asc) replaces the family
    *    default — confidence unchanged;
    * 2. else best trigram-profile score > 0 → that language,
    *    confidence = score / totalTrigrams (ties: lang asc);
    * 3. else und. Text is ASCII-lowercased; words are split-on-' '. */
  def detect(raw: String): (String, Double) = {
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    val s = sb.toString
    // script pass over code points
    var nonspace = 0L
    val scriptCounts = new Array[Long](scripts.length)
    i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp != ' ') {
        nonspace += 1
        // ASCII/Latin-1 (the bulk of web text) sits below every script
        // range — skip the loop outright.
        if (cp >= minScriptLo) {
          var k = 0
          while (k < scriptLo.length) {
            if (cp >= scriptLo(k) && cp <= scriptHi(k)) scriptCounts(k) += 1
            k += 1
          }
        }
      }
      i += Character.charCount(cp)
    }
    if (nonspace == 0) return ("und", 0.0)
    var bestScript = 0
    var k = 1
    while (k < scripts.length) {
      if (scriptCounts(k) > scriptCounts(bestScript)) bestScript = k
      k += 1
    }
    val frac = scriptCounts(bestScript).toDouble / nonspace
    if (frac >= scriptThreshold) {
      val fam = scripts(bestScript)._1
      return (resolveMember(fam, s, nonspace), frac)
    }
    // trigram pass: word-padded trigrams by code point. In-place word
    // scan + one reusable code-point buffer + packed-long probes —
    // semantically identical to `split(' ')` + per-trigram Strings
    // (same words: runs of non-' ' chars; same " w " padding; same
    // weight rows) with zero per-trigram allocation.
    val scores = new Array[Long](latinLangs.length)
    var ntg = 0L
    var buf = new Array[Int](math.min(s.length + 2, 256))
    val n = s.length
    var wStart = 0
    var pos = 0
    while (pos <= n) {
      if (pos == n || s.charAt(pos) == ' ') {
        if (pos > wStart) {
          val need = (pos - wStart) + 2
          if (buf.length < need) buf = new Array[Int](need)
          var len = 0
          buf(len) = ' '; len += 1
          var j = wStart
          while (j < pos) {
            val cp = s.codePointAt(j)
            buf(len) = cp; len += 1
            j += Character.charCount(cp)
          }
          buf(len) = ' '; len += 1
          var p = 0
          while (p <= len - 3) {
            ntg += 1
            val key = (buf(p).toLong << 42) | (buf(p + 1).toLong << 21) | buf(p + 2).toLong
            val v = tgLookup(key)
            if (v != null) {
              var li = 0
              while (li < scores.length) { scores(li) += v(li); li += 1 }
            }
            p += 1
          }
        }
        wStart = pos + 1
      }
      pos += 1
    }
    var best = 0
    k = 1
    while (k < latinLangs.length) { if (scores(k) > scores(best)) best = k; k += 1 }
    if (scores(best) > 0) (latinLangs(best), scores(best).toDouble / ntg)
    else ("und", 0.0)
  }

  /** Tier 1b: the member language of `fam` whose markers cover ≥
    * memberThreshold of non-space code points — largest coverage,
    * ties language-ascending (member lists are sorted) — else `fam`.
    * One extra O(n) pass, and only for the three families that have
    * members. */
  private def resolveMember(fam: String, s: String, nonspace: Long): String =
    members.get(fam) match {
      case None => fam
      case Some(ms) =>
        val counts = new Array[Long](ms.length)
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          var m = 0
          while (m < ms.length) {
            val rs = ms(m)._2
            var r = 0
            while (r < rs.length) {
              if (cp >= rs(r)._1 && cp <= rs(r)._2) counts(m) += 1
              r += 1
            }
            m += 1
          }
          i += Character.charCount(cp)
        }
        var best = -1
        var m = 0
        while (m < ms.length) {
          if (counts(m).toDouble / nonspace >= memberThreshold &&
              (best < 0 || counts(m) > counts(best))) best = m
          m += 1
        }
        if (best < 0) fam else ms(best)._1
    }

  /** Expression entry point: struct(lang, conf) as an InternalRow. */
  def langIdRow(text: UTF8String): InternalRow = {
    if (text == null) return null
    val (lang, conf) = detect(text.toString)
    new GenericInternalRow(Array[Any](UTF8String.fromString(lang), conf))
  }
}

/** `text_stats(text)` → [n_tokens, n_stop, n_punct, alnum_tokens,
  * symbol_tokens, n_chars] with the stop set baked at plan time. */
case class TextStatsExpr(child: Expression, stopWords: Seq[String])
    extends UnaryExpression {
  private val ops = "graft.functions.TextStatsOps$.MODULE$"
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopWords.foreach(s.add)
    s
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextStatsOps.textStats(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ops.textStats($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "text_stats"
}

/** One exact pass over a document's word 2-grams for Gopher-style
  * repetition signals. A HashMap keyed by the gram string keeps counts
  * exact (no sketch, no collision risk), and the whole computation is
  * map-only — the column-algebra alternative (explode + two groupBys)
  * would shuffle every 2-gram occurrence of a 100 TB corpus twice just
  * to come back to one row per doc. */
object RepStatsOps {

  /** → [n2 total 2-gram occurrences, n2_distinct, top_c max count].
    * Tokens are maximal runs of non-space (same split-on-' ' semantics
    * as [[graft.analytics.Dedup.words]], so oracles stay portable). */
  def repStats(text: UTF8String): InternalRow = {
    if (text == null) return null
    val s = text.toString
    val counts = new java.util.HashMap[String, Long]()
    var total = 0L
    var prev: String = null
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && s.charAt(i) != ' ') i += 1
      if (i > start) {
        val tok = s.substring(start, i)
        if (prev != null) {
          val g = prev + " " + tok
          counts.merge(g, 1L, (a, b) => a + b)
          total += 1
        }
        prev = tok
      }
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > top) top = c }
    new GenericInternalRow(Array[Any](total, counts.size.toLong, top))
  }
}

/** `rep_stats(text)` → struct(n2, n2_distinct, top_c) — exact word
  * 2-gram repetition counts (Gopher-style quality signals). */
case class RepStatsExpr(child: Expression) extends UnaryExpression {
  private val ops = "graft.functions.RepStatsOps$.MODULE$"
  override def dataType: DataType = StructType(Seq(
    StructField("n2", LongType, nullable = false),
    StructField("n2_distinct", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    RepStatsOps.repStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ops.repStats($c);")

  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "rep_stats"
}

/** `lang_id(text)` → struct(lang STRING, conf DOUBLE). */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  private val ops = "graft.functions.LangIdOps$.MODULE$"
  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("conf", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    LangIdOps.langIdRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ops.langIdRow($c);")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}

object TextStatExpressions {
  def textStats(text: Column, stopWords: Seq[String]): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(text), stopWords))
  def langId(text: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text)))
  def repStats(text: Column): Column =
    ColumnBridge.column(RepStatsExpr(ColumnBridge.expression(text)))
}
