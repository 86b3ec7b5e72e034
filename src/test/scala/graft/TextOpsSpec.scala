package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Language-ID signal quality: the marker lists must be pairwise unambiguous
  * (a shared form would vote for two languages at once) and the combined
  * word + character-class score must reach ≥95% accuracy on a LABELED
  * fixture of real-language sentences — the synthetic corpus's text is
  * language-blind, so the oracle row `text_langid` can only check the
  * mechanism; this fixture checks the signal. */
class TextOpsSpec extends SparkTestBase {

  test("marker word lists and character classes are pairwise disjoint") {
    val lists = TextOps.langMarkers
    for {
      (la, wa) <- lists
      (lb, wb) <- lists if la < lb
    } {
      val shared = wa.toSet.intersect(wb.toSet)
      assert(shared.isEmpty, s"$la and $lb share marker words: $shared")
    }
    val classes = TextOps.langCharClasses.filter(_._2.nonEmpty)
    for {
      (la, ca) <- classes
      (lb, cb) <- classes if la < lb
    } {
      // character-level disjointness for the literal classes (the zh range
      // is a CJK block — trivially disjoint from the Latin classes)
      val charsA = ca.filterNot("[]\\x{}-".contains(_)).toSet
      val charsB = cb.filterNot("[]\\x{}-".contains(_)).toSet
      val shared = charsA.intersect(charsB)
      assert(shared.isEmpty, s"$la and $lb share marker chars: $shared")
    }
  }

  // A labeled fixture of real sentences (common public vocabulary), 12 per
  // language. Deliberately varied: some rely on function words, some on
  // diacritics, the zh ones have no spaces at all.
  private val labeled: Seq[(String, String)] = Seq(
    // ---- German
    "de" -> "der Hund läuft durch den Park und die Kinder spielen dort",
    "de" -> "das Wetter ist heute nicht gut aber wir gehen nach draußen",
    "de" -> "eine Frau kommt mit dem Zug aus Berlin zu ihrer Familie",
    "de" -> "die Stadt wird bei Nacht von tausend Lichtern beleuchtet",
    "de" -> "wie geht es dir nach der langen Reise durch das Land",
    "de" -> "wir werden morgen früh mit dem Auto nach München fahren",
    "de" -> "der alte Mann liest ein Buch über die Geschichte Europas",
    "de" -> "sind die Äpfel aus dem Garten schon reif oder noch grün",
    "de" -> "von hier aus kann man die Berge und den See gut sehen",
    "de" -> "auch die kleinen Dörfer haben ihre eigene schöne Kirche",
    "de" -> "ich möchte für meine Mutter einen großen Kuchen backen",
    "de" -> "durch das offene Fenster hört man die Vögel singen",
    // ---- English
    "en" -> "the quick brown fox jumps over a lazy dog near the river",
    "en" -> "they have been working on this project for several months",
    "en" -> "it is not clear which of the two options would be better",
    "en" -> "she took her books from the shelf and walked to the door",
    "en" -> "this city has grown rapidly over the past ten years",
    "en" -> "you should have seen the look on his face at that moment",
    "en" -> "the results of the experiment are consistent with theory",
    "en" -> "most people agree that the weather has been unusual lately",
    "en" -> "their house stands at the edge of a small quiet village",
    "en" -> "he wrote a long letter to his friend about the journey",
    "en" -> "we are planning to visit the museum and the old castle",
    "en" -> "that book is one of the best things I have ever read",
    // ---- Spanish
    "es" -> "los niños juegan en la plaza y las madres hablan entre ellas",
    "es" -> "el verano pasado fuimos a la playa con toda la familia",
    "es" -> "no sé cuándo volverá pero creo que será muy pronto",
    "es" -> "la ciudad está llena de turistas durante los meses del verano",
    "es" -> "hay más de dos mil libros en la biblioteca del pueblo",
    "es" -> "¿por qué no vienes con nosotros al cine esta noche?",
    "es" -> "desde aquí se puede ver el mar y también las montañas",
    "es" -> "hace muchos años que no veo a mis amigos de la escuela",
    "es" -> "el café sin azúcar está muy amargo para mí",
    "es" -> "cuando llueve los ríos crecen hasta salirse del cauce",
    "es" -> "una señora muy amable nos explicó cómo llegar al museo",
    "es" -> "trabaja mucho porque quiere comprar una casa para sus padres",
    // ---- French
    "fr" -> "les enfants jouent dans le jardin avec leur chien",
    "fr" -> "nous sommes allés au marché pour acheter des légumes frais",
    "fr" -> "cette ville est connue pour ses musées et ses cafés",
    "fr" -> "il ne faut pas oublier que la vie est courte",
    "fr" -> "vous avez fait tout ce travail en une seule journée",
    "fr" -> "le château se trouve au bord d'une rivière très calme",
    "fr" -> "ils sont arrivés hier soir après un long voyage en train",
    "fr" -> "elle a mis une belle robe pour aller à la fête",
    "fr" -> "comme toujours il est arrivé en retard à son bureau",
    "fr" -> "même les plus petits villages ont leur propre église",
    "fr" -> "où est-ce que tu as trouvé cette photo ancienne",
    "fr" -> "c'était bien la première fois que nous étions aussi heureux",
    // ---- Chinese (no spaces — the character class carries the signal)
    "zh" -> "我们今天去公园散步然后在湖边吃午饭",
    "zh" -> "这个城市的夜景非常漂亮游客都喜欢来这里",
    "zh" -> "他说明天会下雨所以我们把活动改到了室内",
    "zh" -> "中国的高铁网络是世界上最大的交通系统之一",
    "zh" -> "孩子们在学校里学习数学语文和英语",
    "zh" -> "这本书讲的是一个关于友谊和成长的故事",
    "zh" -> "春天来了花园里的花都开了真漂亮",
    "zh" -> "我的朋友住在北京他在一家大公司工作",
    "zh" -> "大家都说这家饭馆的菜做得特别好吃",
    "zh" -> "图书馆里有很多人在安静地看书学习",
    "zh" -> "上个星期我们全家一起去爬山看日出",
    "zh" -> "人们在节日的时候会和家人团聚吃饭")

  test("languageId accuracy >= 95% on the labeled real-language fixture") {
    import spark.implicits._
    val docs = labeled.zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, text, lang) }
      .toDF("doc_id", "text", "lang")
    val pred = TextOps.languageId(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val n = labeled.size.toLong
    val hits = pred.where(col("lang_pred") === col("lang")).count()
    val misses = pred.where(col("lang_pred") =!= col("lang"))
      .select("doc_id", "lang", "lang_pred").collect()
    assert(hits >= math.ceil(n * 0.95).toLong,
      s"accuracy ${hits}/$n; misses: ${misses.mkString(", ")}")
  }
}
