package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosineSimilarity, DamerauLevenshteinExpr, DistinctWordShingles, DotProduct, JaroWinklerExpr, NfcNormalizeExpr, StripAccentsExpr, WinnowFingerprint, WordShingles}

/** Registers the engine's native expressions as SQL functions, so
  * `spark.sql("SELECT vec_cosine(a, b) ...")` works anywhere the library is
  * on the classpath:
  *
  * {{{
  * SparkSession.builder().config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  *   - `vec_dot(a, b)`                      ARRAY<FLOAT|DOUBLE> dot product
  *   - `vec_cosine(a, b)`                   fused cosine similarity
  *   - `distinct_word_shingles(text[, k])`  distinct k-token shingles (k=3)
  *   - `word_shingles(text[, k])`           ALL k-token shingles, positional (k=3)
  *   - `winnow_fingerprint(text[, k, w])`   winnowing hash set (k=5, w=4)
  *   - `jaro_winkler(a, b)`                 Jaro–Winkler similarity [0, 1]
  *   - `damerau_levenshtein(a, b)`          full (unrestricted) DL distance
  *   - `nfc_normalize(text)`                Unicode NFC canonical composition
  *   - `strip_accents(text)`                diacritic removal (NFD, drop Mn)
  *
  * The integer parameters must be literals (they parameterize generated
  * code, not per-row data).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("distinct_word_shingles"),
      new ExpressionInfo(classOf[DistinctWordShingles].getName, "distinct_word_shingles"),
      (es: Seq[Expression]) => DistinctWordShingles(es.head,
        if (es.length > 1) litInt(es(1), "shingle size k") else 3)))

    ext.injectFunction((FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (es: Seq[Expression]) => WordShingles(es.head,
        if (es.length > 1) litInt(es(1), "shingle size k") else 3)))

    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      (es: Seq[Expression]) => JaroWinklerExpr(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshteinExpr].getName, "damerau_levenshtein"),
      (es: Seq[Expression]) => DamerauLevenshteinExpr(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (es: Seq[Expression]) => NfcNormalizeExpr(es.head)))

    ext.injectFunction((FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccentsExpr].getName, "strip_accents"),
      (es: Seq[Expression]) => StripAccentsExpr(es.head)))

    ext.injectFunction((FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fingerprint"),
      (es: Seq[Expression]) => WinnowFingerprint(es.head,
        if (es.length > 1) litInt(es(1), "gram size k") else 5,
        if (es.length > 2) litInt(es(2), "window w") else 4)))
  }
}
