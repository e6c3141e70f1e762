package graft.util

import scala.collection.mutable.ArrayBuffer

/** Minimal HTML DOM for the crawl engine's extraction path.
  *
  * The reference consumes pages through lxml/parsel (Scrapy `response.css` /
  * `xpath`, `/root/reference/core/main.py:93-135`). No HTML parser ships in
  * the offline jar set, so this is a strict-subset recursive-descent parser
  * for the well-formed HTML our page generator (and the fixture corpus)
  * emits: lowercase tags, double-quoted attributes, void elements
  * (`img`, `br`, `hr`, `meta`, `link`, `input`), no comments/CDATA/scripts.
  * Text nodes are entity-decoded at parse time, mirroring lxml (which hands
  * decoded text to `::text`); the reference then *additionally* runs
  * `html.unescape` inside `clean_text` (`core/main.py:21`), which
  * `Extract.cleanText` reproduces.
  */
sealed trait HNode
final case class HText(s: String) extends HNode
final case class HElem(tag: String, attrs: Map[String, String],
                       children: Vector[HNode]) extends HNode {

  def attr(name: String): Option[String] = attrs.get(name)

  /** Whitespace-token containment, allocation-free. The round-5 form
    * (`split("\\s+").contains(c)`) compiled a regex AND allocated a token
    * array on EVERY call — and this predicate runs on every element of the
    * section/anchor walks, the parse hot path. Token boundaries are Java's
    * `\s` class, exactly what the split matched.
    */
  def hasClass(c: String): Boolean = attrs.get("class") match {
    case None => false
    case Some(v) =>
      def isJs(ch: Char): Boolean = ch == ' ' || ch == '\t' || ch == '\n' ||
        ch == '\u000B' || ch == '\f' || ch == '\r'
      val n = v.length
      val m = c.length
      var i = 0
      while (i < n) {
        while (i < n && isJs(v.charAt(i))) i += 1
        var j = i
        while (j < n && !isJs(v.charAt(j))) j += 1
        if (j - i == m && v.regionMatches(i, c, 0, m)) return true
        i = j
      }
      false
  }

  /** All descendant element nodes, document order (self excluded). */
  def descendants: Iterator[HElem] = children.iterator.flatMap {
    case e: HElem => Iterator.single(e) ++ e.descendants
    case _ => Iterator.empty
  }

  /** All descendant text nodes in document order — parsel `::text` getall. */
  def textNodes: Vector[String] = {
    val out = Vector.newBuilder[String]
    def walk(n: HNode): Unit = n match {
      case HText(t) => out += t
      case HElem(_, _, cs) => cs.foreach(walk)
    }
    children.foreach(walk)
    out.result()
  }

  /** `textNodes.mkString(sep)` in one walk — no intermediate Vector. The
    * separator goes between every adjacent pair of text nodes, empty nodes
    * included, exactly as mkString does. Parse-hot (fullText/stringValue
    * run per sibling of every section walk).
    */
  def joinedText(sep: String): String = {
    val sb = new java.lang.StringBuilder
    var first = true
    def walk(n: HNode): Unit = n match {
      case HText(t) =>
        if (first) first = false else sb.append(sep)
        sb.append(t)
      case HElem(_, _, cs) => cs.foreach(walk)
    }
    children.foreach(walk)
    sb.toString
  }

  /** XPath string-value (all descendant text concatenated, no separator) —
    * what cssselect's `:contains()` tests against.
    */
  def stringValue: String = joinedText("")
}

object Html {
  private val voidTags = Set("img", "br", "hr", "meta", "link", "input")

  /** Parse an HTML document into a synthetic root element. Tolerant of the
    * generator subset only; unknown constructs degrade to text.
    */
  def parse(html: String): HElem = {
    var i = 0
    val n = html.length

    def parseAttrs(s: String): Map[String, String] = {
      val out = Map.newBuilder[String, String]
      var j = 0
      val m = s.length
      while (j < m) {
        while (j < m && (s.charAt(j).isWhitespace || s.charAt(j) == '/')) j += 1
        val ks = j
        while (j < m && s.charAt(j) != '=' && !s.charAt(j).isWhitespace && s.charAt(j) != '/') j += 1
        if (j > ks) {
          val key = s.substring(ks, j).toLowerCase
          while (j < m && s.charAt(j).isWhitespace) j += 1
          if (j < m && s.charAt(j) == '=') {
            j += 1
            while (j < m && s.charAt(j).isWhitespace) j += 1
            if (j < m && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
              val q = s.charAt(j); j += 1
              val vs = j
              while (j < m && s.charAt(j) != q) j += 1
              out += key -> PyText.unescapeHtml(s.substring(vs, j))
              if (j < m) j += 1
            } else {
              val vs = j
              while (j < m && !s.charAt(j).isWhitespace) j += 1
              out += key -> s.substring(vs, j)
            }
          } else out += key -> ""
        } else j += 1
      }
      out.result()
    }

    // Stack-based tree build.
    val rootKids = ArrayBuffer.empty[HNode]
    var stack = List.empty[(String, Map[String, String], ArrayBuffer[HNode])]
    def sink: ArrayBuffer[HNode] =
      stack.headOption.map(_._3).getOrElse(rootKids)
    def closeTop(): Unit = stack match {
      case (tag, attrs, kids) :: rest =>
        stack = rest
        sink += HElem(tag, attrs, kids.toVector)
      case Nil =>
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) sink += HText(PyText.unescapeHtml(html.substring(i)))
        i = n
      } else {
        if (lt > i) sink += HText(PyText.unescapeHtml(html.substring(i, lt)))
        val gt = html.indexOf('>', lt + 1)
        if (gt < 0) { i = n } // truncated tag: drop
        else {
          val inner = html.substring(lt + 1, gt)
          if (inner.startsWith("!") || inner.startsWith("?")) {
            // doctype / PI: skip
          } else if (inner.startsWith("/")) {
            val name = inner.substring(1).trim.toLowerCase
            // close up to matching open tag (tolerates our well-formed input)
            while (stack.nonEmpty && stack.head._1 != name) closeTop()
            if (stack.nonEmpty) closeTop()
          } else {
            val selfClosing = inner.endsWith("/")
            val body = if (selfClosing) inner.dropRight(1) else inner
            var k = 0
            while (k < body.length && !body.charAt(k).isWhitespace) k += 1
            val tag = body.substring(0, k).toLowerCase
            val attrs = parseAttrs(body.substring(k))
            if (selfClosing || voidTags(tag)) sink += HElem(tag, attrs, Vector.empty)
            else stack = (tag, attrs, ArrayBuffer.empty[HNode]) :: stack
          }
          i = gt + 1
        }
      }
    }
    while (stack.nonEmpty) closeTop()
    HElem("#root", Map.empty, rootKids.toVector)
  }
}
