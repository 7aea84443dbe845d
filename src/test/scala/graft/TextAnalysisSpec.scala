package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis => TA}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

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
}
