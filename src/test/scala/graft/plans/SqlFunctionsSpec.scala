package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions

/** The extension-injected SQL function surface: a `spark.sql` user gets
  * the same text-analysis primitives as the Column API, with identical
  * results (same expression trees underneath). */
class SqlFunctionsSpec extends SparkSpec {

  test("injected SQL functions match the Column API bit-for-bit") {
    Tables(spark, sf, "documents").createOrReplaceTempView("docs_sqlfn")
    val viaSql = spark.sql("""
      SELECT doc_id, lang_id(text) AS lang, doc_fingerprint(text) AS fp,
             token_count(text) AS n_tokens, quality_score(text, n_chars) AS q
      FROM docs_sqlfn WHERE length(trim(text)) > 0 ORDER BY doc_id""")
    val viaColumns = Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.quality(col("text"), col("n_chars")).as("q"))
      .orderBy("doc_id")
    assert(viaSql.collect().toSeq == viaColumns.collect().toSeq)
  }

  test("rep_ratio is callable from SQL on multi-token docs") {
    val r = spark.sql(
      "SELECT rep_ratio('a b a b') AS r, rep_ratio('x y z') AS r2").head()
    // "a b a b": bigrams [a b, b a, a b] -> 1 duplicate of 3
    assert(math.abs(r.getDouble(0) - 1.0 / 3.0) < 1e-15)
    assert(r.getDouble(1) == 0.0)
  }
}
