package graft

import org.apache.spark.sql.functions._

/** Behavioral contracts of the retrieval/decontamination text ops that
  * the row-level DuckDB oracle states but doesn't explain: t12 must
  * catch every engineered leak, t13's posting lists obey their cap and
  * impact order, t14's ranking is monotone in the rounded score.
  */
class TextSpec extends SparkSuite {

  test("t8's packing window is partitioned — no single-partition sort in the plan") {
    val df = SparkEntry.queries("t8_sequence_pack")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the scale-killer shape this guards against: WindowExec with an
    // empty partition spec forces `Exchange SinglePartition` + a
    // global sort. The bucketed design must hash-partition on part_id.
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(plan.contains("hashpartitioning(part_id"), plan)
    // every doc packed exactly once, bins respect the budget's greedy
    // fill (bin tokens − its last doc < budget ⟹ no bin starts past
    // the boundary it was opened on)
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf).count())
    assert(rows.forall(r => r.getLong(2) > 0L))
  }

  test("t25 separates planted code from prose on every row with clear margin") {
    val df = SparkEntry.queries("t25_code_detect")(spark, sf)
    assert(df.filter(!col("correct")).count() === 0)
    val planted = df.filter(col("is_planted"))
    assert(planted.count() > 0)
    // the margin is wide, not a threshold accident: planted statement
    // lines score far above 0.3, prose far below
    import org.apache.spark.sql.functions.min
    assert(planted.agg(min(col("code_score"))).head.getDouble(0) > 0.5)
    assert(df.filter(!col("is_planted"))
      .agg(org.apache.spark.sql.functions.max(col("code_score")))
      .head.getDouble(0) < 0.15)
  }

  test("t12 flags every eval source doc and every engineered leak") {
    val out = SparkEntry.queries("t12_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evalIds = Tables.documents(spark, sf)
      .filter(col("doc_id") % 40 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(evalIds.nonEmpty)
    // every source doc surfaces (it contains its own passage)...
    assert(evalIds.forall(out.contains), s"missed sources: ${evalIds.filterNot(out.contains)}")
    // ...and every planted leak (id+200000) is flagged with every gram
    // of its embedded passage matching (min doc = 10 words → passage
    // ≥ 8 words → ≥ 3 six-grams)
    val planted = evalIds.map(_ + 200000L)
    assert(planted.forall(out.contains), s"missed leaks: ${planted.filterNot(out.contains)}")
    assert(planted.forall(id => out(id) >= 3L))
  }

  test("t13 posting lists are capped, impact-ordered, and df-consistent") {
    val rows = SparkEntry.queries("t13_inverted_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      // postings ship as a '|'-joined scalar so the correctness gate
      // can row-hash the column (see t13 in TextOps)
      val postings = r.getString(3).split('|').filter(_.nonEmpty).map(_.toLong).toSeq
      assert(postings.size <= 20)
      assert(postings.size == math.min(df, 20L))
      assert(postings.distinct.size == postings.size, s"dup posting for ${r.getString(0)}")
    }
  }

  test("t14 returns k docs in non-increasing rounded-score order") {
    val rows = SparkEntry.queries("t14_bm25_topk")(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.head > 0.0)
  }

  test("t24 BPE training converges monotonically round over round") {
    // the IvfSpec monotone-objective proof applied to tokenizer
    // training: each round merges the top pair, so token count must
    // strictly DECREASE, by at most that pair's count (greedy
    // non-overlapping application can merge fewer occurrences than
    // the pair count when occurrences overlap, never more); the
    // vocabulary grows by at most the one new merged symbol per
    // round; compression is strictly decreasing.
    val rows = SparkEntry.queries("t24_bpe_train")(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.length === 3)
    val base = SparkEntry.queries("t3_token_count")(spark, sf) // sanity anchor only
    assert(base.count() > 0)
    rows.foreach { r => assert(r.getLong(2) >= 1L, s"round ${r.getLong(0)} merged a zero-count pair") }
    val toks = rows.map(_.getLong(4))
    val pairN = rows.map(_.getLong(2))
    val vocab = rows.map(_.getLong(3))
    val comp = rows.map(_.getDouble(5))
    // round 1 vs rounds 2..3
    toks.zip(toks.tail).zipWithIndex.foreach { case ((prev, next), i) =>
      assert(next < prev, s"round ${i + 2}: token count did not decrease")
      assert(next >= prev - pairN(i + 1), s"round ${i + 2}: merged more than the pair count")
    }
    vocab.zip(vocab.tail).foreach { case (prev, next) =>
      assert(next <= prev + 1, "vocabulary grew by more than the one merged symbol")
    }
    comp.zip(comp.tail).foreach { case (a, b) => assert(b < a) }
    assert(comp.forall(c => c > 0.0 && c < 1.0))
  }

  test("t30 BPE apply agrees with t24's training arithmetic doc by doc") {
    val rows = SparkEntry.queries("t30_bpe_apply")(spark, sf).collect()
    assert(rows.length === 500)
    // per-doc sanity: a word is at least one token, a token at least
    // one char, so n_words <= n_tokens <= n_chars; the rates follow
    rows.foreach { r =>
      val (w, c, t) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w <= t && t <= c, s"doc ${r.getLong(0)}: words=$w tokens=$t chars=$c")
      if (w > 0) {
        assert(r.getDouble(4) >= 1.0)              // fertility = tokens/word
        assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0) // vs char baseline
      }
    }
    // cross-operator consistency: summing the applied tokenization
    // over every doc must land EXACTLY on t24's round-3 corpus token
    // count — apply and train are the same arithmetic or one of them
    // is lying
    val t24 = SparkEntry.queries("t24_bpe_train")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(3)).sum === t24.last.getLong(4))
    // the merges genuinely fired: the corpus compressed vs char level
    assert(rows.map(_.getLong(3)).sum < rows.map(_.getLong(2)).sum)
  }

  test("t31 HTML extractor survives adversarial markup") {
    import graft.operators.Html
    // script body is raw text: markup inside JS strings must not leak
    assert(Html.extract(
      """<p>a</p><script>var s = "<div>leak</div>";</script><p>b</p>""")
      .text === "a\nb")
    // style body too, including a '>' combinator
    assert(Html.extract(
      "<p>a</p><style>p > a { content: \"<p>x</p>\" }</style><p>b</p>")
      .text === "a\nb")
    // comments skip wholesale, including decoy blocks inside
    assert(Html.extract("<p>a</p><!-- <p>decoy</p> --><p>b</p>").text === "a\nb")
    // a quoted '>' inside an attribute value does not close the tag
    assert(Html.extract("""<p><a href="/x?a=1>2">link</a></p>""").text === "link")
    // entities: named, decimal, hex; unknown passes through literally
    assert(Html.extract("<p>&lt;&amp;&gt; &#65;&#x42; &bogus; &</p>")
      .text === "<&> AB &bogus; &")
    // uppercase tags and self-closing br are still recognized
    assert(Html.extract("<P>a<BR/>b</P>").text === "a\nb")
    assert(Html.extract("<SCRIPT>x = '<i>no</i>';</SCRIPT><p>c</p>").text === "c")
    // truncation degrades, never throws: unclosed comment, unclosed
    // script, tag cut at EOF
    assert(Html.extract("<p>a</p><!-- never closed").text === "a")
    assert(Html.extract("<p>a</p><script>var x = 1;").text === "a")
    assert(Html.extract("<p>a</p><div class=\"x").text === "a")
    // whitespace runs collapse inside a block; blocks join with \n;
    // inline elements keep the flow
    assert(Html.extract("<p>  a   b\n\tc <b>d</b> e </p>").text === "a b c d e")
    // title is captured AND part of the text (first block)
    val doc = Html.extract("<html><head><title> T 1 </title></head>" +
      "<body><p>body</p></body></html>")
    assert(doc.title === "T 1" && doc.text === "T 1\nbody" && doc.nBlocks === 2L)
    // invalid numeric entities pass through
    assert(Html.extract("<p>&#xZZ; &#; ok</p>").text === "&#xZZ; &#; ok")
    // a close tag whose name is a PREFIX of the raw-text element's
    // name must not end raw-text mode: `</scripty>` stays in the body
    assert(Html.extract(
      """<p>a</p><script>s = "</scripty>";</script><p>b</p>""").text === "a\nb")
    assert(Html.extract(
      "<p>a</p><style>/* </styled> */</style><p>b</p>").text === "a\nb")
    // ...but whitespace/'/' after the name does close (HTML spec)
    assert(Html.extract(
      "<p>a</p><script>x</script ><p>b</p>").text === "a\nb")
    // an empty title must not steal the preceding block's text
    val et = Html.extract("<p>x</p><title></title><p>y</p>")
    assert(et.title === "" && et.text === "x\ny")
    val wt = Html.extract("<p>x</p><title>   </title>")
    assert(wt.title === "" && wt.text === "x")
    // '&'-dense page with no semicolons: bounded lookahead keeps the
    // walk linear and the literals intact
    val amps = "a&" * 5000
    assert(Html.extract(s"<p>$amps</p>").text === amps)
    // a ';' beyond the 10-char entity window is NOT an entity close
    assert(Html.extract("<p>&verylongname; x</p>").text === "&verylongname; x")
  }

  test("t31 extracts the planted page to its closed form on every row") {
    val df = SparkEntry.queries("t31_html_extract")(spark, sf)
    assert(df.filter(!col("matches_plant")).count() === 0)
    assert(df.count() === Tables.documents(spark, sf).count())
    // markup never shuffles: the only exchange is the output sort's
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(text"), plan)
  }
}
