package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, HashExpressions}

/** SQL-surface registration of the custom expressions: every `graft_*`
  * function must resolve in `spark.sql` text and agree exactly with its Column
  * API twin (same Catalyst expression underneath).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = { val s = SparkTestBase.spark; GraftExtensions.register(s); s }

  test("graft_cosine_sim resolves in SQL and matches the Column API") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    df.createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql("SELECT graft_cosine_sim(a, b) AS c FROM ext_vecs")
      .collect()(0).getDouble(0)
    val viaCol = df.select(HashExpressions.cosine_sim(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(viaSql == viaCol)
    assert(spark.sql("SELECT graft_cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0).getDouble(0) == 1.0)
  }

  test("graft_word_shingles + graft_minhash_sig match the dedup pipeline") {
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps")).toDF("id", "text")
      .createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT graft_minhash_sig(graft_word_shingles(text, 3), 16) AS sig FROM ext_docs")
      .collect()(0).getSeq[Long](0)
    val viaCol = Seq((1L, "the quick brown fox jumps")).toDF("id", "text")
      .select(graft.dedup.Dedup.minhashSignature(
        graft.dedup.Dedup.shingles(col("text"), 3), 16))
      .collect()(0).getSeq[Long](0)
    assert(viaSql == viaCol && viaSql.length == 16)
  }

  test("graft_simhash64 and graft_hyperplane_sig resolve and agree") {
    import spark.implicits._
    Seq(("alpha beta gamma", Seq(1.0f, -2.0f, 0.5f))).toDF("text", "vec")
      .createOrReplaceTempView("ext_mix")
    val r = spark.sql(
      """SELECT graft_simhash64(split(text, ' ')) AS sh,
        |       graft_hyperplane_sig(vec, 12, 0) AS hp FROM ext_mix""".stripMargin)
      .collect()(0)
    val c = Seq(("alpha beta gamma", Seq(1.0f, -2.0f, 0.5f))).toDF("text", "vec")
      .select(HashExpressions.simhash64(split(col("text"), " ")).as("sh"),
        HashExpressions.hyperplane_sig(col("vec"), 12, 0).as("hp"))
      .collect()(0)
    assert(r.getLong(0) == c.getLong(0) && r.getLong(1) == c.getLong(1))
  }

  test("graft_simhash_md5 and graft_nfc resolve and match the Column API") {
    import spark.implicits._
    Seq((1L, "alpha beta gamma delta")).toDF("id", "text")
      .createOrReplaceTempView("ext_docs3")
    val viaSql = spark.sql(
      "SELECT graft_simhash_md5(split(lower(trim(text)), '\\\\s+')) AS sig FROM ext_docs3")
      .collect()(0).getLong(0)
    val viaCol = Seq((1L, "alpha beta gamma delta")).toDF("id", "text")
      .select(graft.dedup.Dedup.simhashMd5(col("text"))).collect()(0).getLong(0)
    assert(viaSql == viaCol)
    // NFC: decomposed e+combining-acute composes to U+00E9 in SQL text too
    val nfc = spark.sql("SELECT graft_nfc('café') AS n").collect()(0).getString(0)
    assert(nfc == "café")
  }

  test("non-literal config parameters are rejected with a clear error") {
    import spark.implicits._
    Seq(("x", 3)).toDF("text", "k").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles(text, k) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
