package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled URL kernels (GRAFT-URL v1) — the crawl-side string surface a
  * web-corpus pipeline runs on every document: component extraction,
  * dedup-grade canonicalization, and registrable-domain derivation for
  * per-domain caps/mixture accounting.
  *
  * All functions are single-pass scalar kernels exposed through
  * `StaticInvoke` (whole-stage codegen, zero shuffles) — the 100 TB shape
  * is "derive the domain inside the WARC scan projection", composing with
  * [[graft.sources.WarcSource]] and [[GraftHtmlOps]].
  *
  * === GRAFT-URL v1 parse contract ===
  *
  * Components split per RFC 3986 Appendix B (the reference regex
  * `^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?` — the
  * hand loop below is exactly equivalent and is mirrored in DuckDB by
  * that regex, which is what lets the registry hash-check the kernel
  * cross-engine):
  *
  *  - '''scheme''': chars before the first `:` when that `:` precedes any
  *    `/?#`; lowercased; NULL when absent or empty.
  *  - '''authority''': present iff the remainder starts with `//`; the
  *    userinfo (up to the FIRST `@`) is dropped; a trailing `:digits`
  *    suffix is the '''port''' (NULL when absent; a bare trailing `:` is
  *    dropped); what remains is the '''host''', lowercased, NULL when
  *    empty or when there is no authority. IPv6 bracket hosts need no
  *    special case: `[::1]:8080` splits at the last `:` because only a
  *    digits-only suffix counts as a port.
  *  - '''path''': verbatim up to `?`/`#` (possibly the empty string;
  *    NULL only for NULL input).
  *  - '''query''' / '''fragment''': verbatim after `?` / `#`; NULL when
  *    absent OR empty (`?` with nothing after it) — deliberately
  *    conflated so the contract equals what `regexp_extract`-based
  *    mirrors can express.
  *
  * === GRAFT-URL-CANON v1 ===
  *
  * `scheme://host[:port]path[?query]` with: scheme+host lowercased,
  * userinfo dropped, default ports dropped (http/ws 80, https/wss 443,
  * ftp 21), empty path → `/`, empty query dropped, fragment dropped.
  * NULL unless both scheme and host parse. Percent-decoding and
  * dot-segment removal are deliberately OUT of v1 (they need reserved-set
  * decisions that differ per consumer; v1 is the idempotent, exactly
  * mirrorable core every URL-dedup pass agrees on).
  *
  * === GRAFT-PSL v1 (registrable domain) ===
  *
  * Against a suffix SET (comma-joined literal — production passes the
  * real Public Suffix List collected from a dimension-sized table;
  * [[graft.llm.TextAnalysis.withRegistrableDomain]] wires that):
  * IPv4 literals and `[...]` hosts return the host itself; hosts with
  * empty labels (`..`, leading/trailing `.`) return NULL; otherwise the
  * LONGEST suffix in the set matching on a label boundary wins and the
  * registrable domain is that suffix plus one label — NULL when the host
  * IS the suffix. When no suffix matches, the PSL default `*` rule
  * applies: the suffix is the last label (registrable = last two labels;
  * NULL for single-label hosts).
  */
object GraftUrlOps {

  // ---------------------------------------------------------------- parse

  /** (schemeEnd, authStart, authEnd, pathEnd, queryEnd) over the UTF-16
    * string; -1 marks an absent component. Single pass, no regex. */
  private def bounds(u: String): (Int, Int, Int, Int, Int) = {
    val n = u.length
    // scheme: first ':' strictly before any '/?#'
    var schemeEnd = -1
    var i = 0
    var done = false
    while (i < n && !done) {
      val c = u.charAt(i)
      if (c == ':') { if (i > 0) schemeEnd = i; done = true }
      else if (c == '/' || c == '?' || c == '#') done = true
      else i += 1
    }
    var rest = if (schemeEnd >= 0) schemeEnd + 1 else 0
    // authority: "//" then up to '/?#'
    var authStart = -1
    var authEnd = -1
    if (rest + 1 < n && u.charAt(rest) == '/' && u.charAt(rest + 1) == '/') {
      authStart = rest + 2
      var j = authStart
      while (j < n && u.charAt(j) != '/' && u.charAt(j) != '?' && u.charAt(j) != '#') j += 1
      authEnd = j
      rest = j
    }
    // path: up to '?#'
    var j = rest
    while (j < n && u.charAt(j) != '?' && u.charAt(j) != '#') j += 1
    val pathEnd = j
    // query: after '?' up to '#'
    var queryEnd = -1
    if (j < n && u.charAt(j) == '?') {
      var q = j + 1
      while (q < n && u.charAt(q) != '#') q += 1
      queryEnd = q
    }
    (schemeEnd, authStart, authEnd, pathEnd, queryEnd)
  }

  private def lowerAscii(s: String): String = {
    // URL schemes/hosts lower-case in ASCII only (IDNA is out of v1);
    // java toLowerCase(Locale) on non-ASCII would diverge from SQL lower()
    var i = 0
    var changed = false
    while (i < s.length && !changed) { changed = s.charAt(i) >= 'A' && s.charAt(i) <= 'Z'; i += 1 }
    if (!changed) s
    else {
      val b = new java.lang.StringBuilder(s.length)
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        i += 1
      }
      b.toString
    }
  }

  /** hostport (userinfo stripped) from the authority substring. */
  private def hostPort(u: String, authStart: Int, authEnd: Int): String = {
    var at = -1
    var i = authStart
    while (i < authEnd && at < 0) { if (u.charAt(i) == '@') at = i; i += 1 }
    u.substring(if (at >= 0) at + 1 else authStart, authEnd)
  }

  /** (host, port) split of hostport: a digits-only suffix after the last
    * ':' is the port; a bare trailing ':' is dropped; port -1 = absent.
    *
    * RFC 3986 §3.2.3 port = *DIGIT — ANY length of digits is a port
    * syntactically, so the digits always split off the host. Values the
    * transport cannot carry (> 65535) report as ABSENT (-1): not a
    * clamp, not an overflowed garbage value, and — because the rule is
    * "numeric value", computed after leading zeros — safe at any digit
    * count. The DuckDB oracle mirror applies the identical rule via
    * ltrim + length guard (urlParseCte), so no cross-engine CAST can
    * diverge. */
  private def splitPort(hp: String): (String, Int) = {
    val i = hp.lastIndexOf(':')
    if (i < 0) (hp, -1)
    else if (i == hp.length - 1) (hp.substring(0, i), -1) // bare trailing ':'
    else {
      var j = i + 1
      var digits = true
      while (j < hp.length && digits) { digits = hp.charAt(j) >= '0' && hp.charAt(j) <= '9'; j += 1 }
      if (!digits) (hp, -1)
      else {
        var z = i + 1 // leading zeros are numeric, not positional
        while (z < hp.length - 1 && hp.charAt(z) == '0') z += 1
        val trimmed = hp.substring(z)
        val p =
          if (trimmed.length > 5) -1 // > 99999: out of port range for sure
          else { val v = trimmed.toInt; if (v > 65535) -1 else v }
        (hp.substring(0, i), p)
      }
    }
  }

  def urlScheme(u: UTF8String): UTF8String = {
    val s = u.toString
    val (schemeEnd, _, _, _, _) = bounds(s)
    if (schemeEnd <= 0) null else UTF8String.fromString(lowerAscii(s.substring(0, schemeEnd)))
  }

  def urlHost(u: UTF8String): UTF8String = {
    val s = u.toString
    val (_, a0, a1, _, _) = bounds(s)
    if (a0 < 0) null
    else {
      val (h, _) = splitPort(hostPort(s, a0, a1))
      if (h.isEmpty) null else UTF8String.fromString(lowerAscii(h))
    }
  }

  /** -1 = absent (the Column wrapper maps it to NULL). */
  def urlPort(u: UTF8String): Int = {
    val s = u.toString
    val (_, a0, a1, _, _) = bounds(s)
    if (a0 < 0) -1 else splitPort(hostPort(s, a0, a1))._2
  }

  def urlPath(u: UTF8String): UTF8String = {
    val s = u.toString
    val (schemeEnd, a0, a1, pathEnd, _) = bounds(s)
    val start = if (a0 >= 0) a1 else if (schemeEnd >= 0) schemeEnd + 1 else 0
    UTF8String.fromString(s.substring(start, pathEnd))
  }

  def urlQuery(u: UTF8String): UTF8String = {
    val s = u.toString
    val (_, _, _, pathEnd, queryEnd) = bounds(s)
    if (queryEnd < 0 || queryEnd == pathEnd + 1) null
    else UTF8String.fromString(s.substring(pathEnd + 1, queryEnd))
  }

  def urlFragment(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    val (_, _, _, pathEnd, queryEnd) = bounds(s)
    val hash = if (queryEnd >= 0) queryEnd else pathEnd
    if (hash >= n || hash + 1 >= n) null
    else UTF8String.fromString(s.substring(hash + 1, n))
  }

  private def defaultPort(scheme: String): Int = scheme match {
    case "http" | "ws"   => 80
    case "https" | "wss" => 443
    case "ftp"           => 21
    case _               => -1
  }

  def urlCanonical(u: UTF8String): UTF8String = {
    val s = u.toString
    val (schemeEnd, a0, a1, pathEnd, queryEnd) = bounds(s)
    if (schemeEnd <= 0 || a0 < 0) return null
    val scheme = lowerAscii(s.substring(0, schemeEnd))
    val (hraw, port) = splitPort(hostPort(s, a0, a1))
    if (hraw.isEmpty) return null
    val host = lowerAscii(hraw)
    val path = s.substring(a1, pathEnd)
    val b = new java.lang.StringBuilder(s.length)
    b.append(scheme).append("://").append(host)
    if (port >= 0 && port != defaultPort(scheme)) b.append(':').append(port)
    b.append(if (path.isEmpty) "/" else path)
    if (queryEnd > pathEnd + 1) b.append('?').append(s, pathEnd + 1, queryEnd)
    UTF8String.fromString(b.toString)
  }

  // --------------------------------------------------- registrable domain

  // Per-thread suffix-set memo keyed on the literal's object identity —
  // the GraftModelOps discipline (bounded; a clear merely re-parses).
  private val MemoCap = 64
  private val suffixMemo = ThreadLocal.withInitial[
    java.util.IdentityHashMap[AnyRef, java.util.HashSet[String]]](
    () => new java.util.IdentityHashMap())

  private def suffixSet(csv: UTF8String): java.util.HashSet[String] = {
    val memo = suffixMemo.get()
    val hit = memo.get(csv)
    if (hit != null) return hit
    val set = new java.util.HashSet[String]()
    csv.toString.split(',').foreach { s => val t = s.trim; if (t.nonEmpty) set.add(t) }
    if (memo.size() >= MemoCap) memo.clear()
    memo.put(csv, set)
    set
  }

  /** The compact built-in suffix set (GRAFT-PSL v1 default): the common
    * gTLDs/ccTLDs plus the frequent two-label registries. Production
    * passes the full PSL instead — the contract is the SET, not this
    * sample. */
  val DefaultSuffixes: String = Seq(
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "ai",
    "dev", "app", "info", "biz", "uk", "co.uk", "org.uk", "ac.uk",
    "gov.uk", "au", "com.au", "org.au", "edu.au", "jp", "co.jp", "ac.jp",
    "ne.jp", "de", "fr", "nl", "it", "es", "se", "no", "fi", "dk", "pl",
    "ru", "br", "com.br", "cn", "com.cn", "edu.cn", "in", "co.in", "ca",
    "ch", "at", "be", "kr", "co.kr", "nz", "co.nz", "za", "co.za", "mx",
    "com.mx", "ar", "com.ar", "tr", "com.tr", "tw", "com.tw", "hk",
    "com.hk", "sg", "com.sg", "github.io", "blogspot.com")
    .mkString(",")

  private def isIpv4(h: String): Boolean = {
    var i = 0
    var dots = 0
    var run = 0
    while (i < h.length) {
      val c = h.charAt(i)
      if (c == '.') { if (run == 0 || run > 3) return false; dots += 1; run = 0 }
      else if (c >= '0' && c <= '9') run += 1
      else return false
      i += 1
    }
    dots == 3 && run >= 1 && run <= 3
  }

  def registrableDomain(host: UTF8String, suffixCsv: UTF8String): UTF8String = {
    val h = host.toString
    if (h.isEmpty) return null
    if (h.charAt(0) == '[' || isIpv4(h)) return host
    if (h.charAt(0) == '.' || h.charAt(h.length - 1) == '.' || h.contains("..")) return null
    val set = suffixSet(suffixCsv)
    // walk dot boundaries left to right: the first (longest) suffix in the
    // set wins; remember the previous label start to attach it
    var labelStart = 0
    var prevLabelStart = -1
    while (labelStart >= 0) {
      if (set.contains(h.substring(labelStart))) {
        return if (prevLabelStart < 0) null
        else UTF8String.fromString(h.substring(prevLabelStart))
      }
      prevLabelStart = labelStart
      val dot = h.indexOf('.', labelStart)
      labelStart = if (dot < 0) -1 else dot + 1
    }
    // default * rule: suffix = last label
    val lastDot = h.lastIndexOf('.')
    if (lastDot < 0) null
    else {
      val prevDot = h.lastIndexOf('.', lastDot - 1)
      UTF8String.fromString(h.substring(prevDot + 1))
    }
  }

  // -------------------------------------------------------- Column surface

  private def str(name: String, args: Column*): Column =
    ColumnBridge.column(StaticInvoke(
      GraftUrlOps.getClass, StringType, name,
      args.map(ColumnBridge.expression),
      propagateNull = true, returnNullable = true))

  def urlSchemeCol(url: Column): Column = str("urlScheme", url)
  def urlHostCol(url: Column): Column = str("urlHost", url)
  def urlPathCol(url: Column): Column = str("urlPath", url)
  def urlQueryCol(url: Column): Column = str("urlQuery", url)
  def urlFragmentCol(url: Column): Column = str("urlFragment", url)
  def urlCanonicalCol(url: Column): Column = str("urlCanonical", url)

  /** NULL when the URL has no authority or no digits-only port suffix. */
  def urlPortCol(url: Column): Column = {
    val raw = ColumnBridge.column(StaticInvoke(
      GraftUrlOps.getClass, IntegerType, "urlPort",
      Seq(ColumnBridge.expression(url)),
      propagateNull = true, returnNullable = false))
    org.apache.spark.sql.functions.nullif(raw, org.apache.spark.sql.functions.lit(-1))
  }

  /** GRAFT-PSL v1 over a comma-joined suffix-set literal (defaults to
    * [[DefaultSuffixes]]). */
  def registrableDomainCol(host: Column, suffixCsv: String = DefaultSuffixes): Column =
    str("registrableDomain", host, org.apache.spark.sql.functions.lit(suffixCsv))
}
