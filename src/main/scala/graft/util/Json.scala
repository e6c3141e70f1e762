package graft.util

import graft.functions.{Options, Question, SubSub, Subpart}

/** Tiny JSON writer (no JSON lib in the offline jar set beyond Spark's
  * internals). Emits the reference's dict shapes: `answer`/`solution` keys
  * present only when the reference would have set them
  * (`/root/reference/core/main.py:178-203,449-456,515-529`).
  */
object Json {
  def str(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")
  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => str(k) + ":" + v }.mkString("{", ",", "}")

  // --- generic tree: parse / pretty (for the enrichment file rewrites) ------
  // Jackson ships inside the Spark jar set; field order is preserved
  // (LinkedHashMap) because the reference's json.dump keeps dict insertion
  // order and the enriched artifact must round-trip byte-stably.

  /** Parse arbitrary JSON into Scala trees: LinkedHashMap / Vector / String /
    * Long / Double / Boolean / null.
    */
  def parse(s: String): Any =
    toScala(new com.fasterxml.jackson.databind.ObjectMapper().readTree(s))

  private def toScala(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import com.fasterxml.jackson.databind.node.JsonNodeType._
    n.getNodeType match {
      case OBJECT =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
        n.properties().forEach(e => m.put(e.getKey, toScala(e.getValue)))
        m
      case ARRAY =>
        val b = Vector.newBuilder[Any]
        n.forEach(x => b += toScala(x))
        b.result()
      case STRING => n.textValue()
      case NUMBER => if (n.isIntegralNumber) n.longValue() else n.doubleValue()
      case BOOLEAN => n.booleanValue()
      case _ => null
    }
  }

  /** Indent-2 pretty printer over [[parse]] trees — same layout as the batch
    * sink's artifact writer (json.dump(indent=2, ensure_ascii=False)).
    */
  def pretty(v: Any, indent: Int = 0): String = v match {
    case null => "null"
    case s: String => str(s)
    case m: scala.collection.Map[_, _] =>
      if (m.isEmpty) "{}"
      else {
        val pad = "  " * (indent + 1)
        m.map { case (k, x) => pad + str(k.toString) + ": " + pretty(x, indent + 1) }
          .mkString("{\n", ",\n", "\n" + ("  " * indent) + "}")
      }
    case seq: scala.collection.Seq[_] =>
      if (seq.isEmpty) "[]"
      else {
        val pad = "  " * (indent + 1)
        seq.map(x => pad + pretty(x, indent + 1))
          .mkString("[\n", ",\n", "\n" + ("  " * indent) + "]")
      }
    case b: Boolean => b.toString
    case n => n.toString
  }

  def options(o: Options): String =
    obj(Seq("A" -> str(o.A), "B" -> str(o.B), "C" -> str(o.C), "D" -> str(o.D)))

  def subSub(s: SubSub): String =
    obj(Seq("part" -> str(s.part), "question" -> str(s.question)))

  def subpart(s: Subpart): String = {
    val base = Seq("part" -> str(s.part), "question" -> str(s.question),
      "subparts" -> arr(s.subparts.map(subSub)))
    obj(if (s.solution != null) base :+ ("solution" -> str(s.solution)) else base)
  }

  def question(q: Question): String = {
    val ans = if (q.answer != null) Seq("answer" -> str(q.answer)) else Nil
    val sol = if (q.solution != null) Seq("solution" -> str(q.solution)) else Nil
    val base = Seq(
      "section" -> str(q.section), "type" -> str(q.qtype),
      "number" -> q.number.toString, "question" -> str(q.question)) ++
      (if (q.options != null) Seq("options" -> options(q.options)) else Nil) ++
      (if (q.qtype == "theory") Seq("subparts" -> arr(q.subparts.map(subpart))) else Nil) ++
      Seq("diagrams" -> arr(q.diagrams.map(str))) ++
      // F9 provenance: html-fallback answer on an existing answer_info dict
      // lands AFTER the solution key (Question.answer_after_solution note)
      (if (q.answer_after_solution) sol ++ ans else ans ++ sol)
    obj(base)
  }

  // --- canonical (alpha-sorted keys) forms for golden comparison ------------
  // (dict-insertion order in the reference is path-dependent — e.g. the
  // html-answer fallback inserts "answer" after "solution" — so goldens
  // compare in sorted-key form, matching json.dumps(sort_keys=True).)

  def canonicalSubSub(s: SubSub): String =
    obj(Seq("part" -> str(s.part), "question" -> str(s.question)))

  def canonicalSubpart(s: Subpart): String = {
    val fields = Seq("part" -> str(s.part), "question" -> str(s.question)) ++
      (if (s.solution != null) Seq("solution" -> str(s.solution)) else Nil) ++
      Seq("subparts" -> arr(s.subparts.map(canonicalSubSub)))
    obj(fields)
  }

  def canonicalQuestion(q: Question): String = {
    val fields =
      (if (q.answer != null) Seq("answer" -> str(q.answer)) else Nil) ++
      Seq("diagrams" -> arr(q.diagrams.map(str)),
        "number" -> q.number.toString) ++
      (if (q.options != null) Seq("options" -> options(q.options)) else Nil) ++
      Seq("question" -> str(q.question), "section" -> str(q.section)) ++
      (if (q.solution != null) Seq("solution" -> str(q.solution)) else Nil) ++
      (if (q.qtype == "theory")
        Seq("subparts" -> arr(q.subparts.map(canonicalSubpart))) else Nil) ++
      Seq("type" -> str(q.qtype))
    obj(fields)
  }
}
