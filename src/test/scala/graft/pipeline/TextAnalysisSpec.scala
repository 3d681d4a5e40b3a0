package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: blank text is empty, whitespace runs collapse") {
    val df = Seq("", "   ", "a  b\tc", "one").toDF("text")
    val out = df.select(TextAnalysis.nTokens(col("text"))).as[Int].collect().toSeq
    assert(out == Seq(0, 0, 3, 1))
  }

  test("avgTokenLen and stopwordRatio") {
    val df = Seq("the cat sat").toDF("text")
    val (awl, sr) = df.select(
      TextAnalysis.avgTokenLen(col("text")),
      TextAnalysis.stopwordRatio(col("text"), Seq("the", "a")))
      .as[(Double, Double)].head()
    assert(math.abs(awl - 3.0) < 1e-12)
    assert(math.abs(sr - 1.0 / 3) < 1e-12)
    val empty = Seq("").toDF("text")
      .select(TextAnalysis.avgTokenLen(col("text"))).as[Option[Double]].head()
    assert(empty.isEmpty)
  }

  test("punctRatio counts punctuation share") {
    val r = Seq("ab!?").toDF("text")
      .select(TextAnalysis.punctRatio(col("text"))).as[Double].head()
    assert(math.abs(r - 0.5) < 1e-12)
  }

  test("bpeTokenCount: contractions and punctuation count as extra tokens") {
    val df = Seq(
      ("plain", "hello world"),          // 2
      ("contraction", "it's fine"),      // it | 's | _fine → 3
      ("punct", "wait... what?!")        // wait | ... | _what | ?! → 4
    ).toDF("kind", "text")
    val out = df.select(col("kind"), TextAnalysis.bpeTokenCount(col("text")))
      .as[(String, Int)].collect().toMap
    assert(out("plain") == 2 && out("contraction") == 3 && out("punct") == 4)
  }

  test("langId picks the dominant stopword profile; und when no hits") {
    val df = Seq(
      ("en", "the cat of the house and a dog"),
      ("de", "der hund und die katze ist nicht da"),
      ("es", "el perro y la casa de un gato"),
      ("und", "zzz qqq www")).toDF("expected", "text")
    val out = df.select(col("expected"), TextAnalysis.langId(col("text")))
      .as[(String, String)].collect()
    out.foreach { case (exp, got) => assert(got == exp, s"expected $exp got $got") }
  }

  test("fingerprint: whitespace-insensitive, order-sensitive, stable") {
    val df = Seq(("a b c", "a  b   c", "c b a")).toDF("x", "y", "z")
    val (fx, fy, fz) = df.select(
      TextAnalysis.fingerprint(col("x")),
      TextAnalysis.fingerprint(col("y")),
      TextAnalysis.fingerprint(col("z"))).as[(Long, Long, Long)].head()
    assert(fx == fy, "whitespace differences must not change the fingerprint")
    assert(fx != fz, "token order must change the fingerprint")
  }

  test("qualityScore: clean prose beats degenerate text") {
    val df = Seq(
      ("good", "the quick brown fox jumps over the lazy dog and runs far away today"),
      ("bad", "!!! ??? ... ;;; ::: @@@ ###")).toDF("kind", "text")
    val out = df.select(col("kind"),
      TextAnalysis.qualityScore(col("text"), Seq("the", "a", "and")))
      .as[(String, Double)].collect().toMap
    assert(out("good") > out("bad"))
    assert(out("good") > 0.7 && out("bad") < 0.5)
  }

  test("charEntropy: degenerate text scores 0, uniform alphabet log2(n)") {
    val docs = Seq(
      (1L, "aaaaaaaa"),         // one symbol → 0 bits
      (2L, "abcdabcd"),         // 4 symbols uniform → 2 bits
      (3L, "")                  // nothing to measure → absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .select("doc_id", "entropy_bits").as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 2L))
    assert(math.abs(out(0)._2 - 0.0) < 1e-9)
    assert(math.abs(out(1)._2 - 2.0) < 1e-9)
  }

  test("langIdNgramProfile: separates languages with distinct character profiles") {
    // the driver corpus text is synthetic same-vocabulary filler, so a
    // real multilingual fixture exercises the classifier instead
    val samples = Seq(
      ("xx", "der hund lief schnell durch den dunklen wald und über die wiese"),
      ("xx", "die kinder spielen gerne im garten wenn die sonne scheint"),
      ("yy", "the quick brown fox jumps over the lazy dog near the river bank"),
      ("yy", "children enjoy playing outside whenever the weather is sunny"),
      ("zz", "el perro corre rapido por el bosque oscuro y sobre la pradera"),
      ("zz", "los ninos juegan en el jardin cuando brilla el sol manana"))
    import spark.implicits._
    val docs = samples.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langIdNgramProfile(docs, "doc_id", "text", "lang",
        n = 3, topK = 100)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .select("lang_pred", "lang").as[(String, String)].collect()
    assert(out.forall { case (pred, truth) => pred == truth },
      s"every doc should self-classify on distinct profiles: ${out.toSeq}")
    // blank text falls through to "und"
    val und = TextAnalysis.langIdNgramProfile(
        (Seq((9L, "", "xx")) ++ samples.zipWithIndex.map { case ((l, t), i) => (i.toLong, t, l) })
          .toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang", n = 3, topK = 100)
      .filter($"doc_id" === 9L).select("lang_pred").as[String].head()
    assert(und == "und")
  }

  test("repetitionStats: duplicate lines counted beyond first occurrence") {
    val docs = Seq(
      (1L, "aa bb\naa bb\ncc"),   // 3 lines, "aa bb" ×2 → 1 dup of 5 chars
      (2L, "xx\nyy"),             // no repeats
      (3L, ""),                   // no non-blank lines
      (4L, "zz\n\n  \nzz")        // blank lines dropped; zz ×2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(out(0) == ((1L, 3L, Some(1.0 / 3), Some(5.0 / 12))))
    assert(out(1) == ((2L, 2L, Some(0.0), Some(0.0))))
    assert(out(2) == ((3L, 0L, None, None)))
    assert(out(3) == ((4L, 2L, Some(0.5), Some(0.5))))
  }

  test("topNgramCharFrac: most frequent bigram, lexicographic ties") {
    val docs = Seq(
      (1L, "a b a b a b"),   // "a b" ×3 wins; 3*3/11 chars
      (2L, "one"),           // < 2 tokens → null
      (3L, "x y z")          // all bigrams count 1 → tie → "x y" < "y z"
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topNgramCharFrac(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .as[(Long, Option[String], Option[Double])].collect().toSeq
    assert(out(0)._2.contains("a b"))
    assert(math.abs(out(0)._3.get - 9.0 / 11) < 1e-12)
    assert(out(1) == ((2L, None, None)))
    assert(out(2)._2.contains("x y"))
  }

  test("tfIdfTopTerms: smoothed idf, rare terms win, ties rank by term") {
    val docs = Seq(
      (1L, "Apple banana apple"), // case-folds: apple ×2
      (2L, "banana cherry"),
      (3L, "cherry cherry durian")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Long, Double, Int)].collect().toSeq
    // N=3; idf(df=1)=ln(2)+1, idf(df=2)=ln(4/3)+1
    val idf1 = math.log(2.0) + 1
    val idf2 = math.log(4.0 / 3.0) + 1
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2) == Seq("apple", "banana"), "tf=2 rare term first")
    assert(math.abs(d1.head._5 - 2 * idf1) < 1e-6)
    // doc 2: banana and cherry tie exactly (tf=1, df=2) → term order
    assert(out.filter(_._1 == 2L).map(_._2) == Seq("banana", "cherry"))
    val d3 = out.filter(_._1 == 3L)
    assert(d3.map(_._2) == Seq("cherry", "durian"))
    assert(math.abs(d3.head._5 - 2 * idf2) < 1e-6)
    assert(out.forall(r => r._6 == 1 || r._6 == 2))
  }

  test("sentenceStats: terminal-punct runs split, blanks dropped") {
    val df = Seq(
      (1L, "One two. Three!? Four"),  // 3 sentences: 7, 5, 4 chars
      (2L, "no terminal punct here"), // 1 sentence
      (3L, "")).toDF("doc_id", "text")
    val (n, avg) = TextAnalysis.sentenceStats(col("text"))
    val out = df.select(col("doc_id"), n, avg)
      .as[(Long, Int, Option[Double])].collect().sortBy(_._1)
    assert(out(0)._2 == 3)
    assert(math.abs(out(0)._3.get - (7 + 5 + 4) / 3.0) < 1e-12)
    assert(out(1)._2 == 1)
    assert(out(2) == ((3L, 0, None)))
  }

  test("lineQualityStats: C4 terminal-line fractions by lines and chars") {
    val df = Seq(
      (1L, "Good line.\nbad line\nAlso good!"), // 2/3 lines; 20/28 chars
      (2L, "\n \n"),                            // no non-blank lines
      (3L, "single unterminated")).toDF("doc_id", "text")
    val (n, fl, fc) = TextAnalysis.lineQualityStats(col("text"))
    val out = df.select(col("doc_id"), n, fl, fc)
      .as[(Long, Int, Option[Double], Option[Double])].collect().sortBy(_._1)
    assert(out(0)._2 == 3)
    assert(math.abs(out(0)._3.get - 2.0 / 3) < 1e-12)
    assert(math.abs(out(0)._4.get - 20.0 / 28) < 1e-12)
    assert(out(1) == ((2L, 0, None, None)))
    assert(out(2)._3.contains(0.0) && out(2)._4.contains(0.0))
  }

  test("docFreqTopK: document frequency counts each doc once, k bounds output") {
    val df = Seq(
      (1L, "x y x x"),   // x repeated — still df 1
      (2L, "x y"),
      (3L, "x z"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.docFreqTopK(df, "doc_id", "text", k = 2)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("x", 3L), ("y", 2L)), s"got $out")
    val all = TextAnalysis.docFreqTopK(df, "doc_id", "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(all == Seq(("x", 3L), ("y", 2L), ("z", 1L)))
  }

  test("docFreqTopK plans the top-k as TakeOrderedAndProject, not a global sort") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = TextAnalysis.docFreqTopK(df, "doc_id", "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bigramCrossEntropy: single-doc 'ab' corpus gives exactly 1 bit/bigram") {
    // padded " ab " → bigrams " a","ab","b ", each count 1; prefixes
    // ' ','a','b' each total 1; V = successors {a,b,' '} = 3 →
    // p = (1+1)/(1+3) = 1/2 for every bigram → xent = 1.0 exactly
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCrossEntropy(df, "doc_id", "text")
      .as[(Long, Long, Double)].head()
    assert(out._2 == 3L, s"bigram count: $out")
    assert(math.abs(out._3 - 1.0) < 1e-12, s"xent: $out")
  }

  test("bigramCrossEntropyWith: transfer scoring floors unseen bigrams, counts oov") {
    // model trained on "ab" only (see the exact case above: every
    // seen bigram costs 1 bit, np=1, V=3); scoring "ac" hits:
    //   " a" seen (1 bit), "ac" UNSEEN with seen prefix 'a'
    //   → -log2(1/(1+3)) = 2 bits, "c " UNSEEN with unseen prefix 'c'
    //   → -log2(1/(0+3)) = log2(3) bits
    val lm = TextAnalysis.bigramLm(Seq((1L, "ab")).toDF("doc_id", "text"), "text")
    val out = TextAnalysis.bigramCrossEntropyWith(
        Seq((9L, "ac")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .as[(Long, Long, Long, Double)].head()
    assert(out._2 == 3L && out._3 == 2L, s"counts: $out")
    val expected = (1.0 + 2.0 + math.log(3.0) / math.log(2.0)) / 3.0
    assert(math.abs(out._4 - expected) < 1e-12, s"xent: $out vs $expected")
  }

  test("bigramCrossEntropy: gibberish scores higher than in-distribution text") {
    val fluent = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps"))
    val df = (fluent :+ (99L, "zq xv jw qk vz")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCrossEntropy(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(99L) > out(1L) + 1.0,
      s"rare bigrams must cost more bits: $out")
  }

  test("bpeTrain: hand-computed merges with leftmost-first application and lex ties") {
    // vocab: aaab×3, ab×1
    // r1: (a,a)=6 wins; aaab → [aa,a,b,</w>] (leftmost-first, NOT [aa,aa])
    // r2: (a,b)=4 ties (b,</w>)=4 → lexicographic → (a,b)
    // r3: (ab,</w>)=4
    val df = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(df, "text", merges = 3)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, "a", "a", 6L),
      (2L, "a", "b", 4L),
      (3L, "ab", "</w>", 4L)), s"got $out")
  }

  test("invertedIndex: exact df, postings capped at the lowest ids") {
    val docs = Seq((10L, "a b"), (2L, "a b a"), (7L, "a c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", "text", 2)
      .orderBy("token").as[(String, Long, String)].collect().toSeq
    // token a: df=3 but postings capped to the 2 lowest ids, sorted
    // numerically (2 < 7 < 10 — a lexicographic sort would put 10 first)
    assert(got == Seq(("a", 3L, "2,7"), ("b", 2L, "2,10"),
      ("c", 1L, "7")), s"got $got")
  }

  test("bm25 matches the hand-computed Lucene formula") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("a", "c"))
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    // nd=2, avgdl=2.5, df(a)=df(c)=1 -> idf=ln(2)
    def score(tf: Double, dl: Double) =
      math.log(1.0 + (2.0 - 1 + 0.5) / (1 + 0.5)) *
        (tf * (1.2 + 1)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 2.5))
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(math.abs(got(0)._2 - score(2, 3)) < 1e-12, s"got ${got(0)}")
    assert(math.abs(got(1)._2 - score(1, 2)) < 1e-12, s"got ${got(1)}")
  }

  test("rougeN clips multiset counts and guards empty sides") {
    // unigram case with real clipping: cand "a a a b" {a:3, b:1},
    // ref "a a c" {a:2, c:1} -> clipped = min(3,2) = 2,
    // prec = 2/4, rec = 2/3, f1 = 2*(1/2)*(2/3)/((1/2)+(2/3)) — the
    // EXPECTED value replays the same IEEE fold (≠ 4.0/7 by one ulp)
    val docs = Seq(
      (1L, "a a a b", "a a c"),
      (2L, "x y", ""), // empty ref: rec NULL, f1 0 by definition
      (3L, "", "")) // no grams on either side: no row at all
      .toDF("doc_id", "cand", "ref")
    val got = TextAnalysis.rougeN(docs, "doc_id", "cand", "ref", n = 1)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double], Double)]
      .collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L), s"got $got")
    assert(got(0) == ((1L, 2L, 4L, 3L, Some(0.5), Some(2.0 / 3),
      2.0 * 0.5 * (2.0 / 3) / (0.5 + 2.0 / 3))), s"got ${got(0)}")
    assert(got(1) == ((2L, 0L, 2L, 0L, Some(0.0), None, 0.0)),
      s"got ${got(1)}")
    // bigram clipping: cand "a b a b a b" {ab:3, ba:2}, ref "a b a b"
    // {ab:2, ba:1} -> clipped 3, prec 3/5, rec 3/3
    val bi = TextAnalysis.rougeN(
        Seq((1L, "a b a b a b", "a b a b")).toDF("doc_id", "cand", "ref"),
        "doc_id", "cand", "ref", n = 2)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double], Double)]
      .collect().toSeq
    assert(bi == Seq((1L, 3L, 5L, 3L, Some(0.6), Some(1.0),
      2.0 * 0.6 * 1.0 / (0.6 + 1.0))), s"got $bi")
  }

  test("bpeEncode applies trained merges in rank order") {
    // corpus: "aa"x3, "ab"x1. merge1 = (a, </w>) (count 3, beats
    // (a,a)=3 lexicographically since '<' < 'a'); merge2 = (a, a</w>).
    // encode: "aa" -> [aa</w>] (1 token), "ab" -> [a, b, </w>] (3 —
    // neither merge pattern occurs)
    val docs = Seq((1L, "aa ab"), (2L, "aa aa")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", merges = 2)
    val out = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L, 2L), (2L, 2L, 2L)), s"got $out")
  }

  test("bpeTrain stops early when the vocabulary fully collapses") {
    // corpus "a": round 1 merges (a, </w>); the lone symbol "a</w>"
    // has no pairs left, so rounds 2-3 must yield nothing, not throw
    val out = TextAnalysis.bpeTrain(
        Seq((1L, "a")).toDF("doc_id", "text"), "text", merges = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", "</w>", 1L)), s"got $out")
  }

  test("qualityLogit: bounded in (0,1), prose beats punctuation noise") {
    val df = Seq(
      (1L, "the cat sat on a mat and the dog ran by the tree"),
      (2L, "!!! ??? *** ### !!! ??? *** ###")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextAnalysis.qualityLogit(col("text"), Seq("the", "a")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(out.values.forall(s => s > 0.0 && s < 1.0), s"bounds: $out")
    assert(out(1L) > out(2L) + 0.2, s"prose must outscore noise: $out")
  }

  test("chunkTokens: stride windows, short tail, empty doc drops out") {
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5"), // size 3 stride 2 → [t1..t3], [t3..t5]
      (2L, "a"),              // shorter than size → one 1-token chunk
      (3L, "  ")              // empty → no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, "doc_id", "text", 3, 2)
      .as[(Long, Int, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out == Seq(
      (1L, 0, 3L, "t1 t2 t3"),
      (1L, 1, 3L, "t3 t4 t5"),
      (2L, 0, 1L, "a")), s"got $out")
  }

  test("chunkTokens covers every token: union of chunks == token multiset-ish") {
    // boundary case: nt exactly size + k·stride must not emit an empty
    // trailing chunk, and the last token must always be covered
    for (nt <- 1 to 12) {
      val text = (1 to nt).map("w" + _).mkString(" ")
      val chunks = TextAnalysis.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 4, 3)
        .as[(Long, Int, Long, String)].collect().toSeq
      assert(chunks.forall(_._3 > 0), s"nt=$nt empty chunk: $chunks")
      assert(chunks.last._4.endsWith("w" + nt), s"nt=$nt tail uncovered: $chunks")
      val ids = chunks.map(_._2).sorted
      assert(ids == (0 until chunks.length), s"nt=$nt ids not dense: $ids")
    }
  }

  test("chunkTokens with stride > size (gapped sampling) never emits empty chunks") {
    for (nt <- 1 to 12) {
      val text = (1 to nt).map("w" + _).mkString(" ")
      val chunks = TextAnalysis.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 3, 5)
        .as[(Long, Int, Long, String)].collect().toSeq
      assert(chunks.forall(_._3 > 0), s"nt=$nt empty chunk: $chunks")
      assert(chunks.map(_._2).sorted == (0 until chunks.length),
        s"nt=$nt ids not dense: $chunks")
      // every chunk starts inside the doc: chunk i covers from 5i
      assert(chunks.forall(c => c._2 * 5 < nt), s"nt=$nt phantom chunk: $chunks")
    }
  }

  test("corpusLineDedup strips corpus-wide boilerplate, keeps order, keeps hollow docs") {
    val docs = Seq(
      (1L, "unique one\nFOOTER\nbody a"),
      (2L, "FOOTER\nunique two"),
      (3L, "unique three\nFOOTER"),
      (4L, "FOOTER")). // nothing but boilerplate → hollow, still a row
      toDF("doc_id", "text")
    val out = TextAnalysis.corpusLineDedup(docs, "doc_id", "text", maxDup = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 1L, "unique one\nbody a")), s"got $out")
    assert(out(2L) == ((1L, 1L, "unique two")), s"got $out")
    assert(out(3L) == ((1L, 1L, "unique three")), s"got $out")
    assert(out(4L) == ((0L, 1L, "")), s"hollow doc must survive: $out")
    // at maxDup = 4 the footer is under the bar and everything is kept
    val kept = TextAnalysis.corpusLineDedup(docs, "doc_id", "text", maxDup = 4)
      .as[(Long, Long, Long, String)].collect()
    assert(kept.forall(_._3 == 0L), s"got ${kept.toSeq}")
  }

  test("nbTokenClassifier: disjoint vocabularies separate with correct sign") {
    import spark.implicits._
    // class 1 speaks {sun, moon, star}, class 0 {mud, rust, grit}:
    // every trained bucket weight points the right way, so the logit
    // sign IS the label on the training corpus
    val docs = (0 until 12).map { i =>
      val pos = i % 2 == 0
      val v = if (pos) Seq("sun", "moon", "star") else Seq("mud", "rust", "grit")
      (i.toLong, Seq.tabulate(12)(j => v(j % 3)).mkString(" "),
        if (pos) 1 else 0)
    }.toDF("doc_id", "text", "y")
    val out = TextAnalysis.nbTokenClassifier(docs, "doc_id", "text", "y")
      .as[(Long, Int, Double)].collect().toSeq
    assert(out.size == 12)
    assert(out.forall { case (_, y, s) => (s > 0) == (y == 1) },
      s"sign must match the label on disjoint vocab: $out")
  }

  test("nbTokenClassifier: partitioning-invariant; empty doc scores the prior") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good clean prose here", 1), (2L, "good prose", 1),
      (3L, "junk spam junk", 0), (4L, "", 0)).toDF("doc_id", "text", "y")
    val a = TextAnalysis.nbTokenClassifier(docs, "doc_id", "text", "y")
      .orderBy("doc_id").as[(Long, Int, Double)].collect().toSeq
    val b = TextAnalysis.nbTokenClassifier(docs.repartition(7), "doc_id", "text", "y")
      .orderBy("doc_id").as[(Long, Int, Double)].collect().toSeq
    assert(a == b, "scores must not depend on partitioning")
    // doc 4 has no tokens: its logit is exactly the class prior
    // ln((2+0.5)/(2+0.5)) = 0
    assert(a.find(_._1 == 4L).get._3 == 0.0)
  }

  test("nbTokenModel + nbScore: serving fold matches the batch classifier") {
    import spark.implicits._
    val docs = Seq(
      (1L, "sun moon star sun", 1), (2L, "star sun moon", 1),
      (3L, "mud rust grit mud", 0), (4L, "grit mud", 0),
      (5L, "", 0)).toDF("doc_id", "text", "y")
    val (w, prior) = TextAnalysis.nbTokenModel(docs, "doc_id", "text", "y")
    val served = docs.select(col("doc_id"),
        TextAnalysis.nbScore(col("text"), w, prior).as("s"))
      .orderBy("doc_id").as[(Long, Double)].collect().toMap
    val batch = TextAnalysis.nbTokenClassifier(docs, "doc_id", "text", "y")
      .orderBy("doc_id").as[(Long, Int, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // same model → same scores up to the two folds' summation order
    // (per-bucket k·w vs per-token); on these tiny docs both are exact
    docs.select("doc_id").as[Long].collect().foreach { id =>
      assert(math.abs(served(id) - batch(id)) <= 1e-6,
        s"doc $id: served ${served(id)} vs batch ${batch(id)}")
    }
    // empty doc = rounded prior exactly
    assert(served(5L) == BigDecimal(prior)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("classifierAuc: perfect separation is 1.0, inverted is 0.0") {
    import spark.implicits._
    val good = Seq((3.0, 1), (2.0, 1), (1.0, 0), (0.5, 0)).toDF("s", "y")
    val a1 = TextAnalysis.classifierAuc(good, "s", "y", binsPerUnit = 1)
      .as[(Long, Long, Double)].head
    assert(a1 == ((2L, 2L, 1.0)))
    val bad = Seq((3.0, 0), (2.0, 0), (1.0, 1), (0.5, 1)).toDF("s", "y")
    val a0 = TextAnalysis.classifierAuc(bad, "s", "y", binsPerUnit = 1)
      .as[(Long, Long, Double)].head
    assert(a0 == ((2L, 2L, 0.0)))
  }

  test("classifierPrCurve: hand-checked cumulative bins, exact ratios") {
    import spark.implicits._
    val scored = Seq((3.0, 1), (2.6, 1), (1.2, 0), (0.4, 1), (0.1, 0))
      .toDF("s", "y")
    val out = TextAnalysis.classifierPrCurve(scored, "s", "y", binsPerUnit = 1)
      .orderBy(desc("thr"))
      .as[(Double, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (3.0, 1L, 0L, 2L, 1.0, 1.0 / 3),
      (2.0, 2L, 0L, 1L, 1.0, 2.0 / 3),
      (1.0, 2L, 1L, 1L, 2.0 / 3, 2.0 / 3),
      (0.0, 3L, 2L, 0L, 3.0 / 5, 1.0)))
  }

  test("classifier metrics: single-class corpus yields NULL, never NaN") {
    // the documented degenerate contract: zero positives → recall and
    // AUC are undefined; they must surface as explicit NULLs (the SQL
    // x/0 convention an external replay agrees with), never NaN or
    // Infinity, and the exact counts must survive
    import spark.implicits._
    val allNeg = Seq((3.0, 0), (1.0, 0)).toDF("s", "y")
    val pr = TextAnalysis.classifierPrCurve(allNeg, "s", "y", binsPerUnit = 1)
      .select("tp", "fp", "rec").collect()
    assert(pr.forall(_.isNullAt(2)), "rec must be NULL with zero positives")
    assert(pr.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 1L), (0L, 2L)), "counts stay exact")
    val auc = TextAnalysis.classifierAuc(allNeg, "s", "y", binsPerUnit = 1)
      .select("n_pos", "n_neg", "auc").head
    assert(auc.getLong(0) == 0L && auc.getLong(1) == 2L && auc.isNullAt(2),
      s"auc must be NULL with zero positives, got $auc")
    val allPos = Seq((3.0, 1), (1.0, 1)).toDF("s", "y")
    val auc2 = TextAnalysis.classifierAuc(allPos, "s", "y", binsPerUnit = 1)
      .select("n_pos", "n_neg", "auc").head
    assert(auc2.getLong(0) == 2L && auc2.getLong(1) == 0L && auc2.isNullAt(2),
      s"auc must be NULL with zero negatives, got $auc2")
  }
}
