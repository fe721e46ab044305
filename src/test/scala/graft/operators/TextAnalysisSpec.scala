package graft.operators

import org.apache.spark.sql.Row

import graft.SparkTestBase

/** Specs for the within-document repetition quality metrics
  * (TextAnalysis.repetition) — hand-computed fixtures so every
  * fraction is pinned to exact arithmetic, plus a naive Scala
  * reference over a generated corpus.
  */
class TextAnalysisSpec extends SparkTestBase {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetition matches the hand-computed fixture") {
    // toks = [a, b, a, b, c]; W=2 lines = ["a b", "a b", "c"]
    // bg = ["a b", "b a", "a b", "b c"]; tg = ["a b a", "b a b", "a b c"]
    val out = TextAnalysis.repetition(docs(Seq((1L, "a b a b c"))), lineTokens = 2)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(r.fieldIndex("n_tokens")) == 5L)
    assert(r.getLong(r.fieldIndex("n_lines")) == 3L)
    // (3 lines - 2 distinct) / 3
    assert(r.getDouble(r.fieldIndex("dup_line_frac")) == 0.333333)
    // line chars 3+3+1=7, distinct 3+1=4 -> 3/7
    assert(r.getDouble(r.fieldIndex("dup_line_char_frac")) == 0.428571)
    // "a b" count 2 * len 3 = 6 chars of 9
    assert(r.getDouble(r.fieldIndex("top_bigram_char_frac")) == 0.666667)
    // 2 of 4 bigram positions are the duplicated "a b"
    assert(r.getDouble(r.fieldIndex("dup_bigram_frac")) == 0.5)
    // all trigrams unique
    assert(r.getDouble(r.fieldIndex("dup_trigram_frac")) == 0.0)
  }

  test("repetition: unique text floors every metric except the top bigram") {
    val r = TextAnalysis.repetition(docs(Seq((1L, "p q r s t u"))))
      .collect().head
    assert(r.getDouble(r.fieldIndex("dup_line_frac")) == 0.0)
    assert(r.getDouble(r.fieldIndex("dup_line_char_frac")) == 0.0)
    assert(r.getDouble(r.fieldIndex("dup_bigram_frac")) == 0.0)
    assert(r.getDouble(r.fieldIndex("dup_trigram_frac")) == 0.0)
    // each bigram occurs once; max count*len = len("p q") = 3 of 11
    assert(r.getDouble(r.fieldIndex("top_bigram_char_frac")) == 0.272727)
  }

  test("repetition: a fully-repeated doc saturates the fractions") {
    // toks = [x y] * 4; lines = ["x y"] * 4 -> dup 3/4, chars 9/12
    val r = TextAnalysis.repetition(docs(Seq((1L, "x y x y x y x y"))))
      .collect().head
    assert(r.getDouble(r.fieldIndex("dup_line_frac")) == 0.75)
    assert(r.getDouble(r.fieldIndex("dup_line_char_frac")) == 0.75)
    // "x y" occurs 4 times * 3 chars = 12 of 15
    assert(r.getDouble(r.fieldIndex("top_bigram_char_frac")) == 0.8)
    // every bigram position duplicated ("x y" x4, "y x" x3)
    assert(r.getDouble(r.fieldIndex("dup_bigram_frac")) == 1.0)
    assert(r.getDouble(r.fieldIndex("dup_trigram_frac")) == 1.0)
  }

  test("repetition drops null text and docs under 3 tokens") {
    val out = TextAnalysis.repetition(
      docs(Seq((1L, null), (2L, "a b"), (3L, "a b c"))))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("repetition: all-empty-token doc pins dup_line_char_frac to 0.0, not NaN") {
    // "  " splits to ["", "", ""] — three tokens, every "line" empty
    // at w=1, lineSum = 0. The zero-divisor decision is 0.0 (matching
    // the oracle's COALESCE of DuckDB's NULL division), NOT IEEE NaN —
    // NaN sorts ABOVE every threshold in Spark SQL, so it would read
    // as maximally repetitive downstream. (qualityGate itself runs
    // w=2, where a 2-empty-token line joins to " " and lineSum >= 1 —
    // the degenerate divisor is reachable only at w=1.)
    val out = TextAnalysis.repetition(docs(Seq((1L, "  "))), lineTokens = 1)
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getDouble(r.fieldIndex("dup_line_char_frac")) == 0.0)
    // the sibling line-count fraction is well-defined: 3 empty lines,
    // 1 distinct
    assert(math.abs(r.getDouble(r.fieldIndex("dup_line_frac")) - 0.666667) < 1e-9)
  }

  test("repetition matches a naive Scala reference on a generated corpus") {
    val corpus = (0L until 60L).map { i =>
      val rnd = new scala.util.Random(i)
      val vocab = Vector("a", "bb", "ccc", "dd", "e")
      (i, Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = corpus.map { case (id, text) =>
      val toks = text.split(" ").toSeq
      val lines = toks.grouped(2).map(_.mkString(" ")).toSeq
      val bg = toks.sliding(2).map(_.mkString(" ")).toSeq
      val tg = toks.sliding(3).map(_.mkString(" ")).toSeq
      def dupFrac(xs: Seq[String]) =
        round6((xs.size - xs.distinct.size).toDouble / xs.size)
      val lineChars = lines.map(_.length.toLong).sum
      val distChars = lines.distinct.map(_.length.toLong).sum
      val counts = bg.groupBy(identity).view.mapValues(_.size)
      Row(id, toks.size.toLong, lines.size.toLong,
        dupFrac(lines),
        round6((lineChars - distChars).toDouble / lineChars),
        round6(counts.map { case (g, c) => c.toLong * g.length }.max.toDouble
          / text.length),
        round6(bg.count(x => counts(x) > 1).toDouble / bg.size),
        round6(tg.count(x => tg.count(_ == x) > 1).toDouble / tg.size))
    }
    val got = TextAnalysis.repetition(docs(corpus)).collect()
      .sortBy(_.getLong(0)).toSeq
    assert(got.map(_.toString) == expected.map(_.toString))
  }

  test("qualityGate: each rule fires on its crafted doc; clean doc keeps") {
    val corpus = Seq(
      // 0: clean English-ish doc - every rule passes
      (0L, "the cat sat on the mat and it was a very good day in the park"),
      // 1: too short (4 tokens < 10)
      (1L, "the cat sat down"),
      // 2: mean token length too high (no stopwords either)
      (2L, "extraordinarily incomprehensible characteristically " +
        "disproportionately overwhelmingly institutionalization " +
        "compartmentalization internationalization misinterpretation " +
        "counterproductively"),
      // 3: punctuation-heavy (also repetitive bigrams)
      (3L, "the ?!?! ?!?! ?!?! ?!?! ?!?! ?!?! ?!?! ?!?! ?!?! of !!!"),
      // 4: no stopwords at all
      (4L, "cats dogs birds fish horses sheep goats cows pigs ducks " +
        "geese swans foxes wolves bears"),
      // 5: repetitive - one chunk repeated throughout
      (5L, "the cat the cat the cat the cat the cat the cat the cat " +
        "the cat the cat the cat")
    )
    val got = TextAnalysis.qualityGate(docs(corpus),
        minTokens = 10L, maxDupLineChar = 0.3, maxDupBigram = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def flags(id: Long) = Seq("too_short", "too_long", "bad_word_len",
      "high_punct", "low_stopword", "repetitive")
      .filter(f => got(id).getAs[Boolean](f))
    assert(got(0L).getAs[Boolean]("keep"), s"doc 0 flagged: ${flags(0L)}")
    assert(flags(1L).contains("too_short") && !got(1L).getAs[Boolean]("keep"))
    assert(flags(2L).contains("bad_word_len"), s"doc 2: ${flags(2L)}")
    assert(flags(3L).contains("high_punct"), s"doc 3: ${flags(3L)}")
    assert(flags(4L).contains("low_stopword"), s"doc 4: ${flags(4L)}")
    assert(flags(5L).contains("repetitive") && !got(5L).getAs[Boolean]("keep"),
      s"doc 5: ${flags(5L)}")
    // a keep verdict is exactly the negation of the flag disjunction
    got.values.foreach { r =>
      val any = Seq("too_short", "too_long", "bad_word_len", "high_punct",
        "low_stopword", "repetitive").exists(r.getAs[Boolean])
      assert(r.getAs[Boolean]("keep") == !any)
    }
  }

  test("qualityGate: one scan, no data-dependent exchange; rejects inverted bands") {
    val plan = TextAnalysis.qualityGate(docs(Seq((1L, "a b c"))))
      .queryExecution.executedPlan.toString
    // the ONLY permitted exchange is ScanSpread's round-robin input
    // spread (fires here because the test input is tiny); the gate
    // itself must stay map-only — no hash/range exchange, no join,
    // no aggregation
    val dataExchanges = plan.linesIterator
      .filter(_.contains("Exchange"))
      .filterNot(_.contains("RoundRobinPartitioning"))
      .toSeq
    assert(dataExchanges.isEmpty, s"gate must be map-only:\n$plan")
    intercept[IllegalArgumentException](
      TextAnalysis.qualityGate(docs(Seq()), minTokens = 5, maxTokens = 5))
    intercept[IllegalArgumentException](
      TextAnalysis.qualityGate(docs(Seq()), minMeanTokChars = 9, maxMeanTokChars = 3))
  }
}
