package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernel: HTML → visible text extraction (GRAFT-HTML-TEXT v1),
  * the first stage every web-crawl curation pipeline runs after the
  * [[graft.sources.WarcSource]] scan.
  *
  * The contract (documented in full in `tools/make_warc_fixture.py`,
  * whose expectations are produced by python's STDLIB `html.parser` — an
  * independent tokenizer — and pinned by `q_warc_text`):
  *
  *  1. comments, `<!...>` declarations and `<?...?>` PIs are dropped;
  *     the entire contents of `script`/`style` (raw-text rule: they
  *     close ONLY at `</` + optional WS + name + optional WS + `>`,
  *     case-insensitive — failed candidates remain raw text) and of
  *     `template`/`noscript` elements (parsed normally, text suppressed)
  *     are dropped;
  *  2. `<` opens markup only before `[a-zA-Z]`, `/`, `!` or `?` —
  *     otherwise it is literal text; quoted attribute values may contain
  *     `>`;
  *  3. character references decode with the semicolon-required rule:
  *     `&#NNN;` / `&#xHH;` plus named {amp,lt,gt,quot,apos,nbsp→space};
  *     anything else — unknown names, cp 0, cp > U+10FFFF, and the
  *     surrogate range U+D800–U+DFFF — stays verbatim;
  *  4. opening AND closing tags of block elements contribute a line
  *     break; every other tag contributes nothing; source whitespace
  *     (incl. newlines — and `pre` content) is collapsible space;
  *  5. normalize: collapse runs within lines, strip lines, drop empty
  *     lines, join with `\n`.
  *
  * A scalar kernel (not an operator): one tight single-pass scan per
  * document, exposed through `StaticInvoke` so it rides whole-stage
  * codegen and shuffles nothing — the 100 TB shape is "extract during
  * the WARC scan projection", which is exactly what this composes to.
  */
object GraftHtmlOps {

  private val Block: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hr",
    "html", "li", "main", "nav", "ol", "p", "pre", "section", "table",
    "tbody", "td", "tfoot", "th", "thead", "title", "tr", "ul")

  private val RawText: Set[String] = Set("script", "style")
  private val Suppress: Set[String] = Set("template", "noscript")

  def htmlText(html: UTF8String): UTF8String =
    UTF8String.fromString(extract(html.toString))

  /** The v1 extraction over a JVM string (UTF-16 indexing is safe: all
    * structural characters are ASCII and text is copied verbatim). */
  def extract(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n / 2)
    var suppress = 0 // inside template/noscript
    var i = 0

    def isAsciiLetter(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    def emitBreak(tag: String): Unit =
      if (Block.contains(tag)) out.append('\n')

    def emitText(c: Char): Unit =
      if (suppress == 0)
        out.append(if (c == '\r' || c == '\n' || c == '\t' || c == '\f') ' ' else c)

    // scan a start tag from the '<'; returns index past '>' and the tag
    // name ("" when the tag never closes — treat rest as consumed)
    def startTag(from: Int): (Int, String, Boolean) = {
      var j = from + 1
      val nameStart = j
      while (j < n && !s.charAt(j).isWhitespace && s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
      val name = s.substring(nameStart, j).toLowerCase
      var quote: Char = 0
      var selfClose = false
      while (j < n) {
        val c = s.charAt(j)
        if (quote != 0) {
          if (c == quote) quote = 0
        } else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return (j + 1, name, selfClose)
        else if (c == '/') selfClose = true
        else if (!c.isWhitespace) selfClose = false
        j += 1
      }
      (n, name, selfClose)
    }

    // raw-text contents (script/style): close only at </ WS* name WS* '>'
    def rawTextEnd(from: Int, name: String): Int = {
      var j = from
      while (j < n) {
        val lt = s.indexOf("</", j)
        if (lt < 0) return n
        var k = lt + 2
        while (k < n && s.charAt(k).isWhitespace) k += 1
        if (k + name.length <= n && s.regionMatches(true, k, name, 0, name.length)) {
          var m = k + name.length
          while (m < n && s.charAt(m).isWhitespace) m += 1
          if (m < n && s.charAt(m) == '>') return m + 1
        }
        j = lt + 2
      }
      n
    }

    // character reference at '&'; appends and returns new index
    def charRef(from: Int): Int = {
      var j = from + 1
      if (j < n && s.charAt(j) == '#') {
        j += 1
        val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val digStart = j
        while (j < n && (if (hex) Character.digit(s.charAt(j), 16) >= 0
                         else s.charAt(j) >= '0' && s.charAt(j) <= '9')) j += 1
        if (j > digStart && j < n && s.charAt(j) == ';') {
          try {
            val cp = Integer.parseInt(s.substring(digStart, j), if (hex) 16 else 10)
            // Surrogate code points (U+D800–U+DFFF) are NOT decodable:
            // appendCodePoint would emit a lone UTF-16 surrogate that
            // UTF8String conversion mangles. Rule 3's "anything else
            // stays verbatim" applies — same rule in decode_refs on the
            // python fixture side, where chr(cp) would make a string
            // parquet cannot encode.
            val valid = cp > 0 && cp <= 0x10FFFF && (cp < 0xD800 || cp > 0xDFFF)
            if (valid && suppress == 0) out.appendCodePoint(cp)
            else if (suppress == 0) out.append(s, from, j + 1)
            return j + 1
          } catch { case _: NumberFormatException => }
        }
      } else {
        val nameStart = j
        if (j < n && isAsciiLetter(s.charAt(j))) {
          j += 1
          while (j < n && (isAsciiLetter(s.charAt(j)) ||
            (s.charAt(j) >= '0' && s.charAt(j) <= '9'))) j += 1
        }
        if (j > nameStart && j < n && s.charAt(j) == ';') {
          val decoded = s.substring(nameStart, j) match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ => null
          }
          if (decoded != null) {
            if (suppress == 0) out.append(decoded)
            return j + 1
          }
        }
      }
      emitText('&')
      from + 1
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c2 = s.charAt(i + 1)
        if (isAsciiLetter(c2)) {
          val (next, name, selfClose) = startTag(i)
          if (Suppress.contains(name) && !selfClose) suppress += 1
          emitBreak(name)
          i = if (RawText.contains(name) && !selfClose) {
            val end = rawTextEnd(next, name)
            emitBreak(name) // the close-tag break (script/style: none)
            end
          } else next
        } else if (c2 == '/') {
          var j = i + 2
          while (j < n && s.charAt(j) != '>') j += 1
          val name = s.substring(i + 2, j).trim.toLowerCase
          if (Suppress.contains(name) && suppress > 0) suppress -= 1
          emitBreak(name)
          i = math.min(j + 1, n)
        } else if (c2 == '!') {
          if (s.startsWith("<!--", i)) {
            val end = s.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else if (s.startsWith("<![", i)) {
            val end = s.indexOf("]>", i + 3)
            i = if (end < 0) n else end + 2
          } else {
            val end = s.indexOf('>', i + 2)
            i = if (end < 0) n else end + 1
          }
        } else if (c2 == '?') {
          val end = s.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else {
          emitText(c)
          i += 1
        }
      } else if (c == '&') {
        i = charRef(i)
      } else {
        emitText(c)
        i += 1
      }
    }

    normalize(out.toString)
  }

  /** Rule 5: collapse within lines, strip, drop empties, join. */
  private def normalize(raw: String): String = {
    val out = new java.lang.StringBuilder(raw.length)
    var lineHasText = false
    var pendingSpace = false
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\n') {
        if (lineHasText) { out.append('\n'); lineHasText = false }
        pendingSpace = false
      } else if (c == ' ' || c == '\t' || c == '\r' || c == '\f') {
        if (lineHasText) pendingSpace = true
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
        lineHasText = true
      }
      i += 1
    }
    var len = out.length
    if (len > 0 && out.charAt(len - 1) == '\n') len -= 1
    out.substring(0, len)
  }

  /** `Column` form: `htmlText(col)` — a codegen-friendly static call. */
  def htmlTextCol(html: Column): Column =
    ColumnBridge.column(StaticInvoke(
      GraftHtmlOps.getClass, StringType, "htmlText",
      Seq(ColumnBridge.expression(html)),
      propagateNull = true, returnNullable = false))
}
