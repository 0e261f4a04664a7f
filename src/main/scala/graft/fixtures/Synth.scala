package graft.fixtures

import graft.model._
import graft.functions.TextFns

/** Deterministic synthetic corpus + terminology generator (FIXTURES.md).
  *
  * Everything is a pure function of (index, constants) — no RNG state — so
  * the same rows can be generated on the driver (test oracles) and on
  * executors (`spark.range(n).map(genDoc)`) and are identical at any
  * parallelism. Mirrors the *shape* of the reference inputs: clinical-note
  * style docs with the reference's section headers
  * (`1st Place/src/mimic_common.py:14-36`), a SNOMED-like terminology tree
  * (`1st Place/src/process_data.py:45-112`), and synonym perturbations
  * modeled on the reference dictionary expansions
  * (`1st Place/src/mimic_train.py:198-240`: permutations, word replacements,
  * plural/case variants).
  */
object Synth {

  // ---- deterministic hashing (splitmix64, public algorithm) ----
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def h(parts: Long*): Long = parts.foldLeft(0x51_7c_c1_b7_27_22_0a_95L)((a, p) => mix(a ^ p))
  /** Non-negative bounded hash. */
  def hn(bound: Int, parts: Long*): Int = (math.floorMod(h(parts: _*), bound.toLong)).toInt

  // ---- vocabulary (invented, deterministic) ----
  val adjectives: Vector[String] = Vector(
    "acute", "chronic", "severe", "mild", "recurrent", "bilateral", "persistent",
    "intermittent", "progressive", "stable", "diffuse", "focal", "congenital",
    "degenerative", "ischemic", "benign", "malignant", "obstructive", "superficial",
    "residual", "traumatic", "postoperative", "localized", "generalized", "secondary",
    "primary", "atypical", "refractory", "transient", "subacute", "latent", "advanced")
  val anatomies: Vector[String] = Vector(
    "femur", "wrist", "shoulder", "kidney", "liver", "spleen", "colon", "retina",
    "larynx", "humerus", "ankle", "thyroid", "bladder", "pancreas", "sternum",
    "clavicle", "scapula", "trachea", "duodenum", "patella", "radius", "ulna",
    "tibia", "fibula", "cornea", "maxilla", "mandible", "vertebra", "aorta",
    "ventricle", "atrium", "ureter")
  val nouns: Vector[String] = Vector(
    "fracture", "infection", "lesion", "stenosis", "edema", "hemorrhage",
    "neoplasm", "inflammation", "occlusion", "rupture", "dislocation",
    "hypertrophy", "atrophy", "fibrosis", "necrosis", "ulceration", "abscess",
    "contusion", "laceration", "thrombosis", "aneurysm", "calcification",
    "degeneration", "perforation", "prolapse", "erosion", "dysplasia",
    "effusion", "granuloma", "impingement", "malformation", "spasm")
  val fillers: Vector[String] = Vector(
    "patient", "denies", "reports", "noted", "on", "exam", "today", "overnight",
    "continue", "monitor", "plan", "review", "follow", "up", "as", "needed",
    "improved", "unchanged", "without", "complication", "tolerating", "diet",
    "ambulating", "well", "discussed", "with", "team", "pending", "results",
    "repeat", "labs", "in", "the", "morning", "no", "new", "concerns")

  /** Section header gazetteer (the reference's common headers,
    * `1st Place/src/mimic_common.py:14-36`). */
  val headers: Vector[String] = Vector(
    "Allergies", "History of Present Illness", "Family History",
    "Major Surgical or Invasive Procedure", "Past Medical History",
    "Discharge Disposition", "Attending", "Service", "Date of Birth",
    "Discharge Instructions", "Discharge Condition", "Chief Complaint",
    "Physical Exam", "Pertinent Results", "Discharge Medications",
    "Social History", "Followup Instructions", "Medications on Admission",
    "Discharge Diagnosis")

  val hierarchies: Vector[String] = Vector("finding", "procedure", "body structure")

  // ---- terminology ----
  def conceptId(i: Int): Long = 100003L + i.toLong * 16L // SCTID-ish, sparse

  /** Name-qualifier vocabulary for concept indices past the triple space —
    * disjoint from every other vocab list (adjectives/anatomies/nouns/
    * attrWords/fillers), so qualified names can never collide with an
    * attribute-child or filler phrase. */
  val qualifiers: Vector[String] = Vector(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega", "digamma")

  /** Distinct (adj, anatomy, noun) triple per concept index (bijective
    * walk), extended past the 32^3 = 32,768 triple space by bijective
    * base-24 qualifier words for the cycle index i/total: without them,
    * every name at k = 160k concepts is shared by ~5 concepts, most dict
    * terms become ambiguous, and a large-corpus scaling workload silently
    * degenerates (measured: 1.6M docs produced 7× FEWER candidate pairs
    * than 400k). Names for i < 32,768 — every sf-dir fixture the oracles
    * see (k ≤ 500) — are byte-identical to the unqualified form. */
  def conceptName(i: Int): String = {
    val total = adjectives.length * anatomies.length * nouns.length
    val idx = math.floorMod(i.toLong * 10007L, total.toLong).toInt // 10007 coprime to total
    val a = idx % adjectives.length
    val b = (idx / adjectives.length) % anatomies.length
    val c = idx / (adjectives.length * anatomies.length)
    val base = s"${adjectives(a)} ${anatomies(b)} ${nouns(c)}"
    var j = i / total
    if (j == 0) base
    else {
      val sb = new StringBuilder(base)
      while (j > 0) { // bijective base-24 numeration of the cycle index
        sb.append(' ').append(qualifiers((j - 1) % qualifiers.length))
        j = (j - 1) / qualifiers.length
      }
      sb.toString
    }
  }
  def hierarchy(i: Int): String = hierarchies(i % 3)
  def fsn(i: Int): String = s"${conceptName(i)} (${hierarchy(i)})"
  /** Permutation synonym: "X A B" -> "X of A B" reordered, mirroring the
    * reference's "X of Y" permutations (`1st Place/src/mimic_train.py:198-222`).
    * Qualifier words (4th+) ride along at the end so permutation synonyms
    * stay distinct across name-space cycles. */
  def permSynonym(i: Int): String = {
    val parts = conceptName(i).split(' ')
    (Seq(parts(2), "of", parts(0), parts(1)) ++ parts.drop(3)).mkString(" ")
  }

  /** Deterministic single-char adjacent swap inside the k-th token (mild typo). */
  def typo(s: String, seed: Long): String = {
    val tokens = s.split(' ')
    val ti = hn(tokens.length, seed, 1L)
    val t = tokens(ti)
    if (t.length < 4) s
    else {
      val p = 1 + hn(t.length - 2, seed, 2L) // swap chars p,p+1 (never first char)
      val arr = t.toCharArray
      val tmp = arr(p); arr(p) = arr(p + 1); arr(p + 1) = tmp
      tokens(ti) = new String(arr)
      tokens.mkString(" ")
    }
  }

  /** Concepts restricted to a single section key (reference dicts key some
    * mentions by section, `1st Place/src/mimic_train.py:45-63`). */
  def restrictedSection(i: Int): Option[String] =
    if (i % 7 == 0) Some("past medical history") else None

  // ---- attribute children (the J4 term-extension shape: a child concept
  // whose FSN = one attribute word + the parent's name, linked by Is-A —
  // `1st Place/src/process_data.py:369-417` harvests exactly these) ----
  /** Attribute vocabulary: not in any other vocab list, not stop words. */
  val attrWords: Vector[String] = Vector("left", "right", "upper", "lower")
  def hasAttrChild(i: Int): Boolean = i % 6 == 0 && i % 50 != 49
  def attrWord(i: Int): String = attrWords((i / 6) % attrWords.length)
  /** Child SCTID: parent id + 8 — never collides with conceptId(j) = 100003+16j. */
  def attrChildId(i: Int): Long = conceptId(i) + 8L
  def attrChildName(i: Int): String = s"${attrWord(i)} ${conceptName(i)}"
  def attrChildFsn(i: Int): String = s"${attrChildName(i)} (${hierarchy(i)})"

  def concepts(n: Int): Seq[Concept] =
    (0 until n).map(i => Concept(conceptId(i), if (i % 50 == 49) 0 else 1)) ++
      (0 until n).filter(hasAttrChild).map(i => Concept(attrChildId(i), 1))

  def descriptions(n: Int): Seq[Description] =
    (0 until n).flatMap { i =>
      val cid = conceptId(i)
      val active = if (i % 50 == 49) 0 else 1
      Seq(
        Description(cid, fsn(i), "FSN", active),
        Description(cid, conceptName(i), "SYN", active),
        Description(cid, permSynonym(i), "SYN", active))
    } ++ (0 until n).filter(hasAttrChild).map(i =>
      Description(attrChildId(i), attrChildFsn(i), "FSN", 1))

  /** Is-A tree with fan-out 5: parent(i) = (i-1)/5; plus one Is-A edge per
    * attribute child → its parent. */
  def relationships(n: Int): Seq[Relationship] =
    (1 until n).map(i => Relationship(conceptId(i), conceptId((i - 1) / 5),
      Relationship.IsA, if (i % 50 == 49) 0 else 1)) ++
      (0 until n).filter(hasAttrChild).map(i =>
        Relationship(attrChildId(i), conceptId(i), Relationship.IsA, 1))

  /** The linking dictionary: normalized term -> concept, 3 surface forms per
    * active concept. `includeAttrChildren=true` (default) adds the specific
    * attribute-child terms — the full-terminology scenario; `false` models
    * the reference's TRAINED dict that lacks the long specific forms, the
    * situation the attribute postprocess rewrite exists for.
    * `includeAbbrs=true` (default) adds the normalized (lowercase) initials
    * terms so the LINKAGE pipeline can resolve abbreviation surfaces; the
    * case-folded annotate path must instead use `includeAbbrs=false` +
    * `ucDictionary` (matching "the" in running text against an initialism
    * "THE" is exactly the false-positive family the uc-dict prevents). */
  def dictionary(n: Int, includeAttrChildren: Boolean = true,
                 includeAbbrs: Boolean = true): Seq[DictEntry] =
    ((0 until n).filter(i => i % 50 != 49).flatMap { i =>
      val cid = conceptId(i)
      val section = restrictedSection(i).getOrElse("any")
      Seq(conceptName(i), permSynonym(i)).distinct.map(t =>
        DictEntry(section, TextFns.normalize(t), cid))
    } ++ (if (includeAttrChildren)
      (0 until n).filter(hasAttrChild).map { i =>
        DictEntry(restrictedSection(i).getOrElse("any"),
          TextFns.normalize(attrChildName(i)), attrChildId(i))
      } else Seq.empty)
      ++ (if (includeAbbrs)
      (0 until n).flatMap(i => abbrOf(i, n).map(a =>
        DictEntry(restrictedSection(i).getOrElse("any"),
          TextFns.normalize(a), conceptId(i))))
      else Seq.empty)).distinct

  // ---- synonym-mapping side tables (FIXTURES.md §4, OMOP/Athena analog) ----
  /** External vocabulary: ~20% of concepts mapped through a fake vocabulary
    * with a renamed synonym (exercises the J2 3-way mapping join,
    * `1st Place/src/process_data.py:200-224`). */
  case class ExtConcept(ext_id: Long, name: String, vocabulary: String, code: String)
  case class ExtMapping(ext_id_1: Long, ext_id_2: Long, relationship: String)
  case class Abbreviation(abbr: String, meaning: String)

  def extConcepts(n: Int): Seq[ExtConcept] =
    (0 until n).filter(_ % 5 == 0).map { i =>
      // renamed synonym: swap the adjective for a paraphrase marker word
      val parts = conceptName(i).split(' ')
      ExtConcept(900000L + i, s"${parts(1)} ${parts(2)} ${parts(0)} type",
        if (i % 10 == 0) "FAKEVOCAB1" else "FAKEVOCAB2", f"X$i%06d")
    }

  /** ext concept -> "Maps to" -> a SNOMED-side ext row carrying concept_id. */
  def extMappings(n: Int): Seq[ExtMapping] =
    (0 until n).filter(_ % 5 == 0).map(i => ExtMapping(900000L + i, conceptId(i), "Maps to"))

  /** Abbreviations: initials of the concept name (exercises the lowercase
    * equality join J8, `1st Place/src/process_data.py:268-291`). */
  def abbreviations(n: Int): Seq[Abbreviation] =
    (0 until n).filter(_ % 4 == 0).map { i =>
      val name = conceptName(i)
      Abbreviation(initials(i), name)
    }

  // ---- uppercase-only abbreviation mentions (the F10/uc-dict shape:
  // `1st Place/src/mimic_train.py:extract_uppercase_mentions` +
  // `mimic_predict.py:31-49` case-sensitive dict) ----
  def initials(i: Int): String = conceptName(i).split(' ').map(_.head.toUpper).mkString

  /** Homograph abbreviations: uppercase forms of words common in running
    * text — the reference's real uc-dict cases ("RA" room air vs "Ra",
    * "MR" mitral regurgitation vs "Mr"). Matching these case-FOLDED floods
    * the corpus with false positives; matching them case-SENSITIVELY is the
    * uc-dict's purpose. */
  val homographAbbrs: Vector[String] =
    Vector("THE", "PLAN", "TEAM", "DIET", "LABS", "EXAM", "WELL", "REVIEW")

  /** Deterministic abbreviation assignment: every 4th active concept is a
    * candidate; ~1 in 5 candidates (first-come) takes the next homograph
    * abbreviation, the rest take their initials; duplicate strings are
    * dropped (first concept wins) so every planted abbreviation maps to
    * exactly one concept. Pure function of n, cached per JVM. */
  private val abbrAssignCache =
    new java.util.concurrent.ConcurrentHashMap[Int, java.util.HashMap[Integer, String]]()
  def abbrAssignments(n: Int): java.util.HashMap[Integer, String] =
    abbrAssignCache.computeIfAbsent(n, _ => {
      val out = new java.util.HashMap[Integer, String]()
      val used = new java.util.HashSet[String]()
      var nextHomograph = 0
      var i = 0
      while (i < n) {
        if (i % 4 == 0 && i % 50 != 49) {
          val wantsHomograph =
            hn(5, i.toLong, 61L) == 0 && nextHomograph < homographAbbrs.length
          val abbr =
            if (wantsHomograph) { val a = homographAbbrs(nextHomograph); nextHomograph += 1; a }
            else initials(i)
          if (used.add(abbr)) out.put(i, abbr)
        }
        i += 4
      }
      out
    })
  def abbrOf(i: Int, n: Int): Option[String] = Option(abbrAssignments(n).get(Integer.valueOf(i)))
  def isAbbrPlanted(i: Int, n: Int): Boolean = abbrAssignments(n).containsKey(Integer.valueOf(i))

  /** The case-sensitive dictionary: UPPERCASE abbreviation → concept, for
    * the planted abbreviation concepts (the uc-dict inference input). */
  def ucDictionary(n: Int): Seq[DictEntry] =
    (0 until n).flatMap(i => abbrOf(i, n).map(a =>
      DictEntry(restrictedSection(i).getOrElse("any"), a, conceptId(i))))

  // ---- docs ----
  /** Surface-form variant of concept i for planting occurrence `occ`:
    * 0 = preferred name, 1 = permutation synonym, 2 = typo, 3 = plural,
    * 4 = uppercase. Variant mix mirrors the reference's observed surface
    * diversity (dictionary + typo'd corpus mentions). */
  def surfaceVariant(i: Int, occ: Long): String = {
    val name = conceptName(i)
    hn(5, i.toLong, occ, 7L) match {
      case 0 => name
      case 1 => permSynonym(i)
      case 2 => typo(name, h(i.toLong, occ, 11L))
      case 3 => name + "s"
      case 4 => name.toUpperCase
    }
  }

  def sentenceTemplate(k: Int): (String, String) = k match {
    case 0 => ("The patient reports ", " since admission.")
    case 1 => ("Exam notable for ", " without acute distress.")
    case 2 => ("Imaging demonstrates ", " as described above.")
    case 3 => ("Assessment consistent with ", " per prior documentation.")
    case 4 => ("History significant for ", " managed conservatively.")
    case _ => ("Findings include ", " on review of systems.")
  }

  def fillerSentence(seed: Long): String = {
    val n = 5 + hn(8, seed, 3L)
    (0 until n).map(k => fillers(hn(fillers.length, seed, k.toLong))).mkString(" ").capitalize + "."
  }

  /** Generate one interleaved doc + its gold annotations. Pure in (docIdx,
    * nConcepts). Media spans are interleaved every ~4th fragment
    * (input_hint: kind='media' spans with media_ref, empty text). */
  def genDoc(docIdx: Long, nConcepts: Int): (Doc, Seq[GoldAnnotation]) = {
    val docId = f"doc$docIdx%08d"
    val spans = Seq.newBuilder[DocSpan]
    val golds = Seq.newBuilder[GoldAnnotation]
    var offset = 0
    var fragIdx = 0
    def emitText(t: String): Unit = {
      spans += DocSpan("text", t, "", offset)
      offset += t.length
      fragIdx += 1
      if (fragIdx % 4 == 3) {
        spans += DocSpan("media", "", f"media://${h(docIdx, fragIdx.toLong) & Long.MaxValue}%016x", offset)
        fragIdx += 1
      }
    }
    // preamble (keeps real mentions past the reference's 100-char guard)
    emitText("Name: ___ Unit No: ___\nAdmission Date: ___ Discharge Date: ___\n" +
      fillerSentence(h(docIdx, 91L)) + "\n")
    val nSections = 3 + hn(5, docIdx, 13L)
    var mentionOcc = 0L
    for (s <- 0 until nSections) {
      // distinct headers per doc: rotate through the gazetteer
      val header = headers((hn(headers.length, docIdx, 17L) + s * 3) % headers.length)
      emitText("\n" + header + ":\n")
      // no gold mentions inside veto sections (medications/service/DOB):
      // the reference's corpus carries no annotations there and its
      // matcher refuses them (`1st Place/src/mimic_common.py:148`) — a
      // planted mention in one would be unmatchable by construction
      val vetoSection = {
        val h = header.toLowerCase
        h.contains("medication") || h.contains("service") || h.contains("date of birth")
      }
      val nSent = 1 + hn(3, docIdx, s.toLong, 19L)
      for (t <- 0 until nSent) {
        val withMention = !vetoSection &&
          hn(4, docIdx, s.toLong, t.toLong, 23L) != 0 // 75% of sentences
        if (withMention) {
          // pick a concept legal for this section
          val raw = hn(nConcepts, docIdx, s.toLong, t.toLong, 29L)
          // walk forward to the next concept that is active and legal here
          var ci = raw
          var guard = 0
          while ((ci % 50 == 49 ||
                  restrictedSection(ci).exists(_ != TextFns.normalize(header))) &&
                 guard < nConcepts) { ci = (ci + 1) % nConcepts; guard += 1 }
          // attribute mention (~1/3 of mentions of concepts with an
          // attribute child): FIXED surface "attr + preferred name", gold
          // span covers the attribute word and labels the CHILD concept —
          // the shape `mimic_postprocess_attributes.py` rewrites to
          val attrMention = hasAttrChild(ci) && hn(3, docIdx, mentionOcc, 53L) == 0
          // abbreviation mention (~1/4 of mentions of planted-initialism
          // concepts): UPPERCASE initials — uc-dict shape (F10)
          val abbrMention = !attrMention && isAbbrPlanted(ci, nConcepts) &&
            hn(4, docIdx, mentionOcc, 59L) == 0
          val surface =
            if (attrMention) attrChildName(ci)
            else if (abbrMention) abbrOf(ci, nConcepts).get
            else surfaceVariant(ci, h(docIdx, mentionOcc, 31L))
          val cid = if (attrMention) attrChildId(ci) else conceptId(ci)
          mentionOcc += 1
          val (pre, post) = sentenceTemplate(hn(6, docIdx, s.toLong, t.toLong, 37L))
          emitText(pre)
          val start = offset
          emitText(surface)
          golds += GoldAnnotation(docId, start, start + surface.length, cid)
          emitText(post + " ")
        } else {
          emitText(fillerSentence(h(docIdx, s.toLong, t.toLong, 41L)) + " ")
        }
      }
      emitText("\n")
    }
    (Doc(docId, spans.result()), golds.result())
  }

  /** Driver-side corpus for small tests. */
  def corpus(nDocs: Int, nConcepts: Int): (Seq[Doc], Seq[GoldAnnotation]) = {
    val pairs = (0 until nDocs).map(i => genDoc(i.toLong, nConcepts))
    (pairs.map(_._1), pairs.flatMap(_._2))
  }
}
