package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** GRAFT-URL v1 / GRAFT-URL-CANON v1 / GRAFT-PSL v1 contract pins, a
  * cross-check against `java.net.URI` (an independent RFC 3986 parser) on
  * well-formed URLs, and canonical idempotence over a generated grid. */
class GraftUrlOpsSpec extends SparkSpec {

  private def u8(s: String): UTF8String = UTF8String.fromString(s)
  private def scheme(s: String): String =
    Option(GraftUrlOps.urlScheme(u8(s))).map(_.toString).orNull
  private def host(s: String): String =
    Option(GraftUrlOps.urlHost(u8(s))).map(_.toString).orNull
  private def port(s: String): Int = GraftUrlOps.urlPort(u8(s))
  private def path(s: String): String = GraftUrlOps.urlPath(u8(s)).toString
  private def query(s: String): String =
    Option(GraftUrlOps.urlQuery(u8(s))).map(_.toString).orNull
  private def frag(s: String): String =
    Option(GraftUrlOps.urlFragment(u8(s))).map(_.toString).orNull
  private def canon(s: String): String =
    Option(GraftUrlOps.urlCanonical(u8(s))).map(_.toString).orNull
  private def dom(h: String, sufs: String = GraftUrlOps.DefaultSuffixes): String =
    Option(GraftUrlOps.registrableDomain(u8(h), u8(sufs))).map(_.toString).orNull

  test("parse: the RFC 3986 appendix-B components") {
    val u = "HTTPS://User:pw@WWW.Example.CO.UK:8443/a/b%20c?b=2&a=1#Sec"
    assert(scheme(u) == "https")
    assert(host(u) == "www.example.co.uk")
    assert(port(u) == 8443)
    assert(path(u) == "/a/b%20c")
    assert(query(u) == "b=2&a=1")
    assert(frag(u) == "Sec")
  }

  test("parse: absent components are NULL; empty path is ''") {
    val u = "http://example.com"
    assert(path(u) == "")
    assert(port(u) == -1)
    assert(query(u) == null)
    assert(frag(u) == null)
    assert(scheme("//example.com/x") == null)          // protocol-relative
    assert(host("//example.com/x") == "example.com")
    assert(scheme("/just/a/path") == null)
    assert(host("/just/a/path") == null)
    assert(path("/just/a/path") == "/just/a/path")
    assert(host("mailto:a@b.com") == null)             // no authority
    assert(path("mailto:a@b.com") == "a@b.com")
    assert(host("file:///etc/hosts") == null)          // empty authority
    assert(path("file:///etc/hosts") == "/etc/hosts")
    assert(query("http://x.com/p?") == null)           // empty query
    assert(frag("http://x.com/p#") == null)            // empty fragment
    assert(query("http://x.com/p?#f") == null)
    assert(frag("http://x.com/p?q#f") == "f")
  }

  test("parse: port edge cases incl. IPv6 brackets") {
    assert(host("http://h:8080/") == "h" && port("http://h:8080/") == 8080)
    assert(host("http://h:/x") == "h" && port("http://h:/x") == -1) // bare ':'
    assert(host("http://[::1]/x") == "[::1]" && port("http://[::1]/x") == -1)
    assert(host("http://[::1]:9000/") == "[::1]" && port("http://[::1]:9000/") == 9000)
    assert(host("http://[2001:DB8::2]") == "[2001:db8::2]")
    assert(port("http://[2001:db8::2]") == -1)
    assert(host("http://u@h:81") == "h" && port("http://u@h:81") == 81)
    // RFC 3986 port = *DIGIT at any length: the digits always split off
    // the host; values > 65535 report absent (never a clamp, never an
    // Int overflow). Leading zeros are numeric.
    assert(host("http://h:65535/") == "h" && port("http://h:65535/") == 65535)
    assert(host("http://h:065535/") == "h" && port("http://h:065535/") == 65535)
    assert(host("http://h:65536/") == "h" && port("http://h:65536/") == -1)
    assert(host("http://h:99999999999/") == "h" && port("http://h:99999999999/") == -1)
    assert(host("http://h:99999999999999999999/") == "h" &&
      port("http://h:99999999999999999999/") == -1)
    assert(host("http://h:000000000000080/") == "h" &&
      port("http://h:000000000000080/") == 80)
    assert(port("http://h:0/") == 0)
    // an over-range port canonicalizes with the port omitted, same host
    assert(canon("http://H:99999999999/x") == "http://h/x")
  }

  test("agrees with java.net.URI on well-formed absolute URLs") {
    val urls = Seq(
      "https://www.example.co.uk:8443/a/b?x=1&y=2#frag",
      "http://user@sub.host.io/path",
      "ftp://files.example.com:2121/pub/x.txt",
      "http://example.com", "https://h/p?q", "http://[::1]:8080/v6")
    for (s <- urls) {
      val j = new java.net.URI(s)
      assert(scheme(s) == j.getScheme.toLowerCase, s)
      assert(host(s) == Option(j.getHost).map(_.toLowerCase).orNull, s)
      assert(port(s) == j.getPort, s)
      assert(path(s) == j.getRawPath, s)
      assert(query(s) == j.getRawQuery, s)
      assert(frag(s) == j.getRawFragment, s)
    }
  }

  test("canonical: GRAFT-URL-CANON v1") {
    assert(canon("HTTP://User@Example.COM:80/a?b=2#f") == "http://example.com/a?b=2")
    assert(canon("https://Example.com:443") == "https://example.com/")
    assert(canon("https://example.com:8443") == "https://example.com:8443/")
    assert(canon("http://example.com/?") == "http://example.com/")
    assert(canon("ftp://H:21/f") == "ftp://h/f")
    assert(canon("ws://H:80/s") == "ws://h/s")
    assert(canon("wss://H:443/s") == "wss://h/s")
    assert(canon("other://H:80/s") == "other://h:80/s")  // unknown scheme keeps port
    assert(canon("//no.scheme/x") == null)
    assert(canon("mailto:a@b.com") == null)              // no authority
    assert(canon("file:///p") == null)                   // empty host
  }

  test("canonical is idempotent over a generated URL grid") {
    val schemes = Seq("http", "HTTPS", "ftp", "other")
    val hosts = Seq("Example.com", "a.b.co.uk", "[::1]", "10.0.0.1", "h")
    val ports = Seq("", ":80", ":443", ":8080", ":")
    val paths = Seq("", "/", "/a/b", "/a%20b")
    val queries = Seq("", "?", "?a=1&b=2")
    val frags = Seq("", "#f")
    var n = 0
    for (s <- schemes; h <- hosts; p <- ports; pa <- paths; q <- queries; f <- frags) {
      val url = s"$s://$h$p$pa$q$f"
      val c1 = canon(url)
      assert(c1 != null, url)
      assert(canon(c1) == c1, s"not idempotent: $url -> $c1 -> ${canon(c1)}")
      n += 1
    }
    assert(n == schemes.size * hosts.size * ports.size * paths.size * queries.size * frags.size)
  }

  test("seeded fuzz: parse recovers randomly assembled components") {
    val rnd = new scala.util.Random(4242)
    val schemes = Seq("http", "https", "ftp", "ws", "x-custom+v1.0")
    def randHost(): String = rnd.nextInt(4) match {
      case 0 => s"host${rnd.nextInt(100)}.example.com"
      case 1 => s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.0.${rnd.nextInt(256)}"
      case 2 => "[2001:db8::" + rnd.nextInt(16).toHexString + "]"
      case _ => s"sub-${rnd.nextInt(10)}.x${rnd.nextInt(10)}.co.uk"
    }
    def randPath(): String = rnd.nextInt(3) match {
      case 0 => ""
      case 1 => "/"
      case _ => "/" + Seq.fill(rnd.nextInt(3) + 1)(s"p${rnd.nextInt(100)}").mkString("/")
    }
    for (_ <- 0 until 500) {
      val sch = schemes(rnd.nextInt(schemes.length))
      val h = randHost()
      val userinfo = if (rnd.nextBoolean()) "" else "user:p-w@"
      val p = if (rnd.nextBoolean()) -1 else rnd.nextInt(65536)
      val pa = randPath()
      val q = if (rnd.nextBoolean()) null else s"a=${rnd.nextInt(10)}&b=%20x"
      val f = if (rnd.nextBoolean()) null else s"frag-${rnd.nextInt(10)}"
      val url = sch + "://" + userinfo + h +
        (if (p >= 0) s":$p" else "") + pa +
        (if (q != null) s"?$q" else "") +
        (if (f != null) s"#$f" else "")
      assert(scheme(url) == sch.toLowerCase, url)
      assert(host(url) == h.toLowerCase, url)
      assert(port(url) == p, url)
      assert(path(url) == pa, url)
      assert(query(url) == q, url)
      assert(frag(url) == f, url)
      // canonical re-parses to the same host/scheme and is idempotent
      val c = canon(url)
      assert(c != null && host(c) == h.toLowerCase && scheme(c) == sch.toLowerCase, url)
      assert(canon(c) == c, url)
    }
  }

  test("registrable domain: GRAFT-PSL v1 rules") {
    assert(dom("www.example.co.uk") == "example.co.uk")  // 2-label suffix
    assert(dom("a.b.example.com") == "example.com")      // 1-label suffix
    assert(dom("example.com") == "example.com")
    assert(dom("co.uk") == null)                          // host IS a suffix
    assert(dom("com") == null)
    assert(dom("uk") == null)
    assert(dom("x.github.io") == "x.github.io")           // private registry
    assert(dom("github.io") == null)
    assert(dom("deep.sub.domain.example.ac.uk") == "example.ac.uk")
    assert(dom("host.unknowntld") == "host.unknowntld")   // default * rule
    assert(dom("a.b.unknowntld") == "b.unknowntld")
    assert(dom("localhost") == null)                      // single label
    assert(dom("10.0.0.1") == "10.0.0.1")                 // IPv4 literal
    assert(dom("999.999.999.999") == "999.999.999.999")   // still IPv4-shaped
    assert(dom("[::1]") == "[::1]")                       // IPv6
    assert(dom("bad..host") == null)                      // empty label
    assert(dom(".bad.host") == null)
    assert(dom("bad.host.") == null)
    // custom (deeper) suffix set: longest match wins at 3 labels
    val s3 = "jp,kawasaki.jp,city.kawasaki.jp"
    assert(dom("x.city.kawasaki.jp", s3) == "x.city.kawasaki.jp")
    assert(dom("city.kawasaki.jp", s3) == null)
    assert(dom("y.kawasaki.jp", s3) == "y.kawasaki.jp")
  }

  test("registrable domain on 1.2.3.4.5 follows the default rule") {
    // not IPv4 (5 octets); '5' is not in the set -> default * rule gives
    // '4.5' — pinned separately because it reads surprisingly
    assert(dom("1.2.3.4.5") == "4.5")
  }

  test("Column surface composes inside a projection (codegen path)") {
    import spark.implicits._
    val df = Seq(
      (1L, "HTTPS://User@WWW.Example.CO.UK:443/a?q=1#x"),
      (2L, "http://10.0.0.1:8080/api"),
      (3L, "not a url, just text"),
      (4L, null.asInstanceOf[String])).toDF("id", "url")
    val out = df.select(
      col("id"),
      GraftUrlOps.urlSchemeCol(col("url")).as("scheme"),
      GraftUrlOps.urlHostCol(col("url")).as("host"),
      GraftUrlOps.urlPortCol(col("url")).as("port"),
      GraftUrlOps.urlCanonicalCol(col("url")).as("canon"),
      GraftUrlOps.registrableDomainCol(GraftUrlOps.urlHostCol(col("url"))).as("domain"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "https" && out(1L).getString(2) == "www.example.co.uk")
    assert(out(1L).getInt(3) == 443) // port column reports presence; only CANON drops defaults
    assert(out(1L).getString(4) == "https://www.example.co.uk/a?q=1")
    assert(out(1L).getString(5) == "example.co.uk")
    assert(out(2L).getInt(3) == 8080 && out(2L).getString(5) == "10.0.0.1")
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2) && out(3L).isNullAt(5))
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(4))
  }
}
