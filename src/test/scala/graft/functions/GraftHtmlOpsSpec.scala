package graft.functions

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GRAFT-HTML-TEXT v1: the Scala scanner against the committed
  * expectations computed by python's STDLIB html.parser (an independent
  * tokenizer), plus unit pins of every contract rule. */
class GraftHtmlOpsSpec extends SparkSpec {

  private def x(html: String): String = GraftHtmlOps.extract(html)

  test("matches the html.parser-derived expectations on the crawl fixture") {
    val exp = spark.read.parquet(
      new File("data/warc/text_expected.parquet").getAbsolutePath)
    val got = spark.read
      .format(classOf[graft.sources.WarcSource].getName)
      .option("path", new File("data/warc/crawl.warc.gz").getAbsolutePath)
      .load()
      .filter(col("record_type") === "response" && col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(col("record_idx"), col("target_uri"),
        GraftHtmlOps.htmlTextCol(col("payload").cast("string")).as("text"))
    val g = got.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val e = exp.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(g.keySet == e.keySet)
    for ((k, ev) <- e) assert(g(k) == ev,
      s"record $k diverges:\n--- scala\n${g(k)}\n--- python\n$ev")
  }

  test("rule 1: comments, decls, PIs, script/style/template/noscript drop") {
    assert(x("a<!-- c -->b") == "ab")
    assert(x("<!DOCTYPE html>x<?php y ?>z") == "xz")
    assert(x("a<script>ignore<div>me</div></script>b") == "ab")
    assert(x("a<style>p { x: '>' }</style>b") == "ab")
    assert(x("a<noscript><p>hidden</p></noscript>b") == "a\nb")     // breaks, no text
    assert(x("a<template><li>hidden</li></template>b") == "a\nb")
  }

  test("rule 1: script closes only at </ ws* name ws* > (html.parser rule)") {
    assert(x("<script>var s = \"</sCRipt not close\";</SCRIPT>after") == "after")
    assert(x("<script>x</script foo>bar</script>z") == "z")
    assert(x("<script>a</scri\npt></script>z") == "z")
    assert(x("<style>a</ StYlE >z") == "z")
  }

  test("rule 2: literal < and quoted-attribute >") {
    assert(x("a < b and b > a") == "a < b and b > a")
    assert(x("""<a href="x" title="a>b">link</a> tail""") == "link tail")
  }

  test("rule 3: semicolon-required references; unknown names verbatim") {
    assert(x("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'")
    assert(x("non&nbsp;breaking") == "non breaking")
    assert(x("&copy; stays & bare &#65;&#x42;&#x1F600;") == "&copy; stays & bare AB😀")
    assert(x("&bogus; and &unterminated") == "&bogus; and &unterminated")
    // surrogate-range and out-of-range numeric refs stay verbatim: a
    // decoded lone surrogate would be an invalid string UTF8String
    // mangles, and the python fixture side could not even write it
    assert(x("a &#xD800; b &#56320; c &#xDFFF; d") ==
      "a &#xD800; b &#56320; c &#xDFFF; d")
    assert(x("&#x110000; over &#0; zero") == "&#x110000; over &#0; zero")
    // the boundaries around the surrogate gap still decode
    assert(x("&#xD7FF;").codePointAt(0) == 0xD7FF)
    assert(x("&#xE000;").codePointAt(0) == 0xE000)
    assert(x("&#x10FFFF;").codePointAt(0) == 0x10FFFF)
  }

  test("rule 4: block tags break lines, inline tags join, source newlines collapse") {
    assert(x("<p>one</p><p>two</p>") == "one\ntwo")
    assert(x("<b>bo</b>ld") == "bold")
    assert(x("line\nwrap") == "line wrap")
    assert(x("a<br/>b<br>c") == "a\nb\nc")
    assert(x("<ul><li>x</li><li>y</li></ul>") == "x\ny")
  }

  test("rule 5: whitespace collapse, empty-line drop, strip") {
    assert(x("  a\t\t b  ") == "a b")
    assert(x("<p>  </p><p>x</p>") == "x")
    assert(x("<div>\n\n</div>") == "")
  }

  test("NULL propagates; the kernel rides codegen (no UDF node)") {
    import spark.implicits._
    val df = Seq(Some("<p>x</p>"), None).toDF("h")
      .select(GraftHtmlOps.htmlTextCol(col("h")).as("t"))
    assert(df.collect().map(r => Option(r.getString(0))).toSet == Set(Some("x"), None))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
