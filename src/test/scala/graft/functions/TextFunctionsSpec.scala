package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    Seq(text).toDF("t").select(c(col("t"))).head()

  test("tokenCount is robust to irregular whitespace") {
    assert(one("  a  b\t c ", TextFunctions.tokenCount).getInt(0) == 3)
    assert(one("", TextFunctions.tokenCount).getInt(0) == 0)
  }

  test("regexTokenCount splits words, digits, and symbols") {
    assert(one("abc123!x", TextFunctions.regexTokenCount).getInt(0) == 4)
  }

  test("shingles of short docs are empty, not errors") {
    assert(one("only two", c => size(TextFunctions.shingles(c, 3))).getInt(0) == 0)
    assert(one("a b c d", c => size(TextFunctions.shingles(c, 3))).getInt(0) == 2)
  }

  test("langId detects marker words and CJK") {
    assert(one("der Hund und die Katze ist nicht da", TextFunctions.langId).getString(0) == "de")
    assert(one("the cat is of course happy with this", TextFunctions.langId).getString(0) == "en")
    assert(one("你好 世界", TextFunctions.langId).getString(0) == "zh")
    assert(one("xyzzy plugh", TextFunctions.langId).getString(0) == "und")
  }

  test("qualityScore stays within [0,1] and favors clean prose") {
    val clean = one("the quick brown fox is one of the best and most famous " * 3,
      TextFunctions.qualityScore).getDouble(0)
    val junk = one("!!! ??? ;;; ### $$$", TextFunctions.qualityScore).getDouble(0)
    assert(clean > junk)
    assert(clean >= 0.0 && clean <= 1.0 && junk >= 0.0 && junk <= 1.0)
  }

  test("rollingFingerprint is order-sensitive and deterministic") {
    val a = one("alpha beta gamma", TextFunctions.rollingFingerprint).getLong(0)
    val a2 = one("alpha beta gamma", TextFunctions.rollingFingerprint).getLong(0)
    val b = one("gamma beta alpha", TextFunctions.rollingFingerprint).getLong(0)
    assert(a == a2, "same input → same fingerprint")
    assert(a != b, "token order must matter")
  }

  test("vector cosine of a vector with itself is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("hyperplane signatures of identical vectors collide") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (3L, Seq(-1.0f, -2.0f, -3.0f, -4.0f))
    ).toDF("id", "v")
    val sigs = df.select(col("id"), VectorFunctions.hyperplaneSignature(col("v"), 16))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L), "antipodal vector flips every plane")
  }
}
