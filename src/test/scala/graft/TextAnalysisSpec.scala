package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis => TA}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("boilerplate stats: repeated spans counted by occurrence, short docs drop out") {
    val docs = Seq(
      (1L, "legal header here then one two three"),   // shared span + unique tail
      (2L, "legal header here then four five six"),
      (3L, "legal header here then seven eight nine"),
      (4L, "legal header here legal header here"),    // span twice: occurrences count
      (5L, "totally unique text with no repeats"),
      (6L, "too short")                               // < 3 tokens: no grams
    ).toDF("doc_id", "text")
    val out = TA.boilerplateStats(docs, n = 3, minDf = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "legal header here" df=4 (docs 1-4) is the only gram at df >= 4
    assert(!out.contains(6L))
    assert(out(1L) == (5L, 1L) && out(2L) == (5L, 1L) && out(3L) == (5L, 1L))
    assert(out(4L) == (4L, 2L)) // both occurrences of the span count
    assert(out(5L) == (4L, 0L))
  }

  test("tokenizers: whitespace, word, bpe-ish counts") {
    val df = Seq(("It's 42 tokens, right?")).toDF("text")
      .select(
        size(TA.wsTokens(col("text"))).as("ws"),
        size(TA.wordTokens(col("text"))).as("word"),
        size(TA.bpeishTokens(col("text"))).as("bpe"))
    val r = df.head()
    assert(r.getInt(0) == 4)      // It's | 42 | tokens, | right?
    assert(r.getInt(1) == 5)      // it | s | 42 | tokens | right
    assert(r.getInt(2) == 9)      // It ' s | 4 2 | tokens , | right ?
  }

  test("graft_polyhash is bit-identical to the interpreted HOF char fold") {
    val rnd = new scala.util.Random(42)
    val samples = Seq("", "a", "tok3n", "the quick brown fox", "0" * 200) ++
      (1 to 50).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString.toLowerCase)
    def hofFold(t: org.apache.spark.sql.Column, b: Long, p: Long) =
      aggregate(
        transform(slice(split(t, ""), lit(1), length(t)),
                  c => ascii(c).cast("long")),
        lit(0L), (a, c) => (a * b + c) % p)
    for ((b, p) <- Seq((131L, 1000000007L), (137L, 998244353L))) {
      val bad = samples.toDF("s")
        .select(col("s"),
          call_function("graft_polyhash", col("s"), lit(b), lit(p)).as("x"),
          hofFold(col("s"), b, p).as("y"))
        .filter(col("x") =!= col("y")).collect()
      assert(bad.isEmpty, s"base=$b mod=$p: ${bad.mkString(", ")}")
    }
    // and inside a transform lambda (the winnowing call shape)
    val arr = Seq((Seq("alpha", "beta", "gamma42"))).toDF("toks")
      .select(
        transform(col("toks"),
          t => call_function("graft_polyhash", t, lit(131L), lit(1000000007L))).as("x"),
        transform(col("toks"), t => hofFold(t, 131L, 1000000007L)).as("y"))
      .head()
    assert(arr.getSeq[Long](0) == arr.getSeq[Long](1))
  }

  test("language guess: stopword profiles pick the dominant language") {
    val df = Seq(
      ("en", "the cat and the dog sat in the house that is old"),
      ("es", "el gato y la casa de los perros en que vive una familia"),
      ("de", "der hund und die katze sind mit das haus von ist nicht"),
      ("fr", "le chat et les chiens dans un jardin une maison est"),
      ("unknown", "zzz qqq www")
    ).toDF("expected", "text")
      .select(col("expected"), TA.wordTokens(col("text")).as("toks"))
      .select(col("expected"), TA.langGuess(
        TA.hitCount(col("toks"), TA.stopEn), TA.hitCount(col("toks"), TA.stopEs),
        TA.hitCount(col("toks"), TA.stopDe), TA.hitCount(col("toks"), TA.stopFr))
        .as("got"))
    val bad = df.filter(col("expected") =!= col("got")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("rolling fingerprint: deterministic, order-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha")
    ).toDF("id", "text")
      .select(col("id"), TA.rollingFingerprint(TA.wsTokens(col("text"))).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("punctuation and token-length sums") {
    val r = Seq(("Hi, there! Ok?")).toDF("text")
      .select(TA.punctCount(col("text")).as("p"),
              TA.tokenLenSum(TA.wsTokens(col("text"))).as("l")).head()
    assert(r.getLong(0) == 3)
    assert(r.getLong(1) == 12) // "Hi," + "there!" + "Ok?" = 3+6+3
  }

  // TrigramHitsSpec (referenced from TextAnalysis.trigramHits): the
  // replace-based substring count must equal the positional-trigram count
  // for every profile, on adversarial fixtures and random text over the
  // profiles' own alphabet (back-to-back pattern repeats, pattern-dense
  // strings, empties, sub-trigram strings, multi-byte UTF8).
  test("trigramHits == positional charTrigrams count for all profiles") {
    val rnd = new scala.util.Random(63)
    val alphabet = (TA.triEn ++ TA.triEs ++ TA.triDe ++ TA.triFr)
      .flatten.distinct :+ 'é'
    val randoms = Seq.tabulate(40) { i =>
      (0 until rnd.nextInt(200)).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString + (if (i % 3 == 0) "thethe the  de de der und" else "")
    }
    val crafted = Seq("", "th", "thethethe", " de de  la la ", "ententent",
                      "inginging", "ééé the é", "  ", "und" * 50)
    val df = (randoms ++ crafted).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .select(col("id"), lower(col("text")).as("lt"))
    val withBoth = df
      .select(col("id"), col("lt"), TA.charArray(col("lt")).as("chars"))
      .select(col("id"), col("lt"), TA.charTrigrams(col("chars")).as("tris"))
      .select(col("id"),
        TA.trigramHits(col("lt"), TA.triEn).as("fast_en"),
        TA.hitCount(col("tris"), TA.triEn).as("slow_en"),
        TA.trigramHits(col("lt"), TA.triEs).as("fast_es"),
        TA.hitCount(col("tris"), TA.triEs).as("slow_es"),
        TA.trigramHits(col("lt"), TA.triDe).as("fast_de"),
        TA.hitCount(col("tris"), TA.triDe).as("slow_de"),
        TA.trigramHits(col("lt"), TA.triFr).as("fast_fr"),
        TA.hitCount(col("tris"), TA.triFr).as("slow_fr"))
    val bad = withBoth.filter(
      col("fast_en") =!= col("slow_en") || col("fast_es") =!= col("slow_es") ||
      col("fast_de") =!= col("slow_de") || col("fast_fr") =!= col("slow_fr"))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("trigramHits rejects self-overlapping profiles") {
    intercept[IllegalArgumentException] {
      TA.trigramHits(col("x"), Seq("aba")) // period 2: "ababa" overlaps
    }
    intercept[IllegalArgumentException] {
      TA.trigramHits(col("x"), Seq("aaa")) // period 1
    }
  }
}
