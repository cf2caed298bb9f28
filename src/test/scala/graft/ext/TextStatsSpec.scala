package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("token and char counts") {
    val df = Seq("hello  world ", "one").toDF("text")
    val got = df.select(
      TextStats.tokenCount($"text").as("nt"),
      TextStats.charCount($"text").as("nc")).collect()
    assert(got(0).getInt(0) === 2)
    assert(got(0).getInt(1) === 13)
    assert(got(1).getInt(0) === 1)
  }

  test("wordOccurrences counts whitespace-delimited tokens only") {
    val df = Seq("the theory of the cat", "nothing here", "the").toDF("text")
    val got = df.select(TextStats.wordOccurrences($"text", "the")).as[Int].collect()
    assert(got(0) === 2) // 'theory' must not match
    assert(got(1) === 0)
    assert(got(2) === 1) // whole-string token
  }

  test("bpeTokenCount splits contractions, numbers and symbol runs like the GPT-2 pretokenizer") {
    // expected piece counts pinned against DuckDB's RE2 on the same
    // pattern (the oracle engine for q_ext_bpe_tokens): leftmost-first
    // alternation gives ["don","'t"," stop"," me"," now"] etc.
    val df = Seq(
      "don't stop me now",       // 5: don | 't | _stop | _me | _now
      "it's 2024, 100% true!",   // 8: it | 's | _2024 | , | _100 | % | _true | !
      "...!!!",                  // 1: one symbol run
      "",                        // 0
      "   "                      // 3: each uncaptured whitespace is a piece
    ).toDF("text")
    val got = df.select(TextStats.bpeTokenCount($"text")).as[Int].collect().toSeq
    assert(got === Seq(5, 8, 1, 0, 3))
  }

  test("langId picks the dominant stopword language, und when none") {
    val df = Seq(
      "the cat sat on a mat of the king",
      "der hund und die katze und das haus",
      "xyzzy plugh").toDF("text")
    val got = df.select(TextStats.langId($"text")).as[String].collect().toSeq
    assert(got === Seq("en", "de", "und"))
  }

  test("qualityScore is in [0,1] and rewards prose-like text") {
    val prose = ("the quick brown fox jumps over a lazy dog and runs to the hills. " * 3)
    val junk = "@@@@ #### $$$$"
    val df = Seq(prose, junk).toDF("text")
    val got = df.select(TextStats.qualityScore($"text")).as[Double].collect()
    assert(got(0) === 1.0)
    assert(got(1) <= 0.5)
  }

  test("repetition signals: dup-token and top-n-gram fractions") {
    val df = Seq(
      "a b a b a b",        // bigrams: "a b"x3, "b a"x2 -> top 3/5
      "x y z w",            // all distinct
      "q",                  // shorter than any bigram
      ""                    // empty
    ).toDF("text")
    val got = df.select(
      TextStats.dupTokenFrac($"text").as("d"),
      TextStats.topNgramFrac($"text", 2).as("b2"),
      TextStats.topNgramFrac($"text", 3).as("b3")).collect()
    assert(got(0).getDouble(0) === 0.666667) // 1 - 2/6 rounded
    assert(got(0).getDouble(1) === 0.6) // "a b" 3 of 5 bigrams
    assert(got(0).getDouble(2) === 0.5) // "a b a" 2 of 4 trigrams
    assert(got(1).getDouble(0) === 0.0 && got(1).getDouble(1) === 0.333333)
    assert(got(2).getDouble(1) === 0.0) // no bigrams, not a DESC sequence
    assert(got(3).getDouble(1) === 0.0)
  }

  test("chunkTokens: windows with overlap; short docs give one chunk") {
    val df = Seq("a b c d e f g h i j", "x y", "").toDF("text")
    val got = df.select(TextStats.chunkTokens($"text", 4, 2)).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c d", "c d e f", "e f g h", "g h i j"))
    assert(got(1) === Seq("x y"))
    assert(got(2) === Seq(""))
    // exact cover, no stride: disjoint windows, ragged tail
    val cover = df.select(TextStats.chunkTokens($"text", 4, 4)).as[Seq[String]].collect()
    assert(cover(0) === Seq("a b c d", "e f g h", "i j"))
  }

  test("redactPii replaces emails, URLs, phones, and IPs with typed tags") {
    val df = Seq(
      "mail a.b+c@x-corp.co.id now",
      "see https://ex.am/ple?q=1 and http://plain.net",
      "call +62 811 555 0042 ok",
      "host 192.168.0.1 up",
      "clean text stays").toDF("text")
    val got = df.select(TextStats.redactPii($"text")).as[String].collect()
    assert(got(0) === "mail <EMAIL> now")
    assert(got(1) === "see <URL> and <URL>")
    assert(got(2).startsWith("call <PHONE>") && got(2).endsWith("ok"))
    assert(got(3) === "host <IP> up")
    assert(got(4) === "clean text stays")
  }

  test("normalizeForDedup: case, punctuation, and spacing variants collapse") {
    val df = Seq("Hello,  World!", "hello world", "HELLO -- world ").toDF("text")
    val got = df.select(TextStats.normalizeForDedup($"text")).as[String].collect()
    assert(got.toSet === Set("hello world"))
  }

  test("tfIdfTopTerms surfaces rare terms over common ones") {
    val df = Seq(
      (1L, "common common rare"),
      (2L, "common common other"),
      (3L, "common unique unique")).toDF("doc_id", "text")
    val top = TextStats.tfIdfTopTerms(df, "doc_id", "text", 1)
      .select("id", "term").as[(Long, String)].collect().toMap
    // 'common' is in every doc (idf = ln(1) = 0); each doc's rarest
    // term wins even with lower tf.
    assert(top === Map(1L -> "rare", 2L -> "other", 3L -> "unique"))
  }

  test("c4Rules: each rule fires on its marker, keep is the conjunction") {
    val docs = Seq(
      "A perfectly normal sentence with enough words.",
      "no terminal punctuation here at all",
      "Too short.",
      "This has a { brace marker in it, bad sign.",
      "Lorem Ipsum dolor sit amet filler text.",
      "Please enable JavaScript to view this page.")
      .toDF("text")
    val rows = docs.select(TextStats.c4Rules($"text").as("r"))
      .select("r.ends_with_punct", "r.long_enough", "r.no_brace",
        "r.no_lorem", "r.no_js", "r.keep")
      .collect().map(r => (0 to 5).map(r.getBoolean))
    assert(rows(0) === Seq(true, true, true, true, true, true))
    assert(!rows(1)(0) && !rows(1)(5)) // no terminal punct
    assert(!rows(2)(1) && !rows(2)(5)) // too short
    assert(!rows(3)(2) && !rows(3)(5)) // brace
    assert(!rows(4)(3) && !rows(4)(5)) // lorem ipsum
    assert(!rows(5)(4) && !rows(5)(5)) // javascript
  }

  test("tokenEntropy: uniform distribution hits log2(k), repetition lowers it") {
    val df = Seq(
      (1L, "a b c d"),     // 4 distinct, uniform -> H = 2.0
      (2L, "a a a a"),     // single token -> H = 0.0
      (3L, "a a b b")      // two at 1/2 -> H = 1.0
    ).toDF("doc_id", "text")
    val got = TextStats.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 2.0) < 1e-12)
    assert(math.abs(got(2L)) < 1e-12)
    assert(math.abs(got(3L) - 1.0) < 1e-12)
  }

  test("fingerprints: md5 stable, rolling hash is order-aware") {
    val df = Seq("a b c", "a b c", "c b a").toDF("text")
    val md5s = df.select(TextStats.fingerprintMd5($"text")).as[String].collect()
    assert(md5s(0) === md5s(1) && md5s(0).length === 16)
    val rolls = df.select(TextStats.fingerprintRolling($"text")).as[Long].collect()
    assert(rolls(0) === rolls(1))
    assert(rolls(0) !== rolls(2)) // same bag of words, different order
  }

  test("boilerplate predicate: short, nav-bar, and legal lines flagged; prose kept") {
    val df = Seq(
      "Home | About | Contact",                                  // nav bar
      "Copyright 2024 Example Corp",                             // legal
      "ok bye",                                                  // too short
      "We use cookie banners to track everything you never read.", // legal marker
      "This perfectly ordinary sentence should clearly survive the filter."
    ).toDF("line")
    val got = df.select(TextStats.isBoilerplateLine($"line")).as[Boolean].collect()
    assert(got.toSeq === Seq(true, true, true, true, false))
  }

  test("stripBoilerplate keeps prose lines joined in order; audit counts match") {
    val text = Seq(
      "First real paragraph with plenty of words in it.",
      "Home | Products | Pricing | Blog",
      "Second real paragraph also has enough words here.",
      "doc 42").mkString("\n")
    val row = Seq(text).toDF("text")
      .select(TextStats.boilerplateAudit($"text").as("a"))
      .select($"a.n_lines", $"a.n_boiler", $"a.clean_text").collect().head
    assert(row.getInt(0) === 4)
    assert(row.getInt(1) === 2)
    assert(row.getString(2) ===
      "First real paragraph with plenty of words in it.\n" +
        "Second real paragraph also has enough words here.")
  }

  test("a fully-boilerplate document strips to the empty string") {
    val row = Seq("a | b | c\nshort").toDF("text")
      .select(TextStats.stripBoilerplate($"text")).collect().head
    assert(row.getString(0) === "")
  }

  test("nfcNormalize composes; nfkcNormalize also folds compatibility forms") {
    val decomposed = "cafe\u0301"   // e + combining acute
    val composed = "caf\u00e9"
    val got = Seq((decomposed, "\ufb01 \uff11\uff12\uff13"))
      .toDF("a", "b")
      .select(TextStats.nfcNormalize($"a"), TextStats.nfkcNormalize($"b"),
        TextStats.nfcNormalize($"b")).collect().head
    assert(got.getString(0) === composed)
    assert(got.getString(1) === "fi 123", "ligature + fullwidth digits fold under NFKC")
    assert(got.getString(2) === "\ufb01 \uff11\uff12\uff13",
      "NFC must NOT fold compatibility forms")
  }

  test("scriptProfile counts per script and picks the dominant one") {
    val row = Seq("abc \u4f60\u597d\u4e16\u754c\u4e2d\u6587 \u043c\u0438\u0440 12!")
      .toDF("text")
      .select(TextStats.scriptProfile($"text").as("p")).select($"p.*")
      .collect().head
    assert(row.getLong(0) === 3L, "latin")
    assert(row.getLong(1) === 6L, "han")
    assert(row.getLong(2) === 3L, "cyrillic")
    assert(row.getLong(3) === 2L, "digits")
    assert(row.getLong(4) === 3L, "spaces")
    assert(row.getLong(5) === 1L, "other: the bang")
    assert(row.getString(6) === "han")
  }

  test("scriptProfile on empty text reports none") {
    val row = Seq("").toDF("text")
      .select(TextStats.scriptProfile($"text")("dominant_script")).collect().head
    assert(row.getString(0) === "none")
  }

  test("readabilityStats: hand counts and the Flesch formula") {
    // 6 words, 2 sentence marks, 6 vowel groups:
    // flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    val row = Seq("The cat sat. The dog ran!")
      .toDF("text")
      .select(TextStats.readabilityStats($"text").as("r")).select($"r.*")
      .collect().head
    assert(row.getAs[Long]("n_words") === 6L)
    assert(row.getAs[Long]("n_sents") === 2L)
    assert(row.getAs[Long]("n_syll") === 6L)
    assert(row.getAs[Double]("flesch") === 119.19)
  }

  test("readabilityStats: no terminal punctuation still counts 1 sentence") {
    val row = Seq("polysyllabic vocabulary increases difficulty")
      .toDF("text")
      .select(TextStats.readabilityStats($"text").as("r")).select($"r.*")
      .collect().head
    assert(row.getAs[Long]("n_words") === 4L)
    assert(row.getAs[Long]("n_sents") === 1L)
    // vowel groups: o,y,y,a,i | o,a,u,a,y | i,ea,e | i,i,u,y = 17
    assert(row.getAs[Long]("n_syll") === 17L)
    // long words, one sentence: low readability
    assert(row.getAs[Double]("flesch") < 0.0)
  }

  test("tokenizer fertility: micro-unit integer ratios are exact floor division") {
    // "don't stop" -> ws tokens 2; bpe pieces: don / 't / (space)stop = 3
    val df = Seq(("en", "don't stop"), ("en", "go now"), ("de", "abc"))
      .toDF("lang", "text")
    val got = df.groupBy($"lang")
      .agg(
        sum(TextStats.tokenCount($"text").cast("long")).as("ws_tokens"),
        sum(TextStats.bpeTokenCount($"text").cast("long")).as("bpe_tokens"))
      .select($"lang",
        expr("(bpe_tokens * 1000000L) DIV ws_tokens").as("fertility_micro"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("fertility_micro"))
      .toMap
    // en: ws 2+2=4, bpe 3+2=5 -> 5_000_000/4 = 1_250_000 exactly
    assert(got("en") === 1250000L)
    // de: 1 word, 1 piece -> exactly 1e6
    assert(got("de") === 1000000L)
  }
}
