package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis operators: language ID, normalization,
  * and content fingerprinting. All deterministic (md5 hashing, integer
  * votes with explicit precedence) so results are identical across
  * runs, retries, and engines. The aggregate-shaped text recipes
  * (quality features, TF-IDF, repetition rate) live as check queries —
  * they are pipelines over these columns, not single columns.
  */
object TextStats {

  /** Count of tokens in the named token-array column that appear in
    * the stopword list — the vote basis for language ID. */
  def stopwordHits(wColName: String, words: Seq[String]): Column = {
    val arr = words.map(s => s"'$s'").mkString(", ")
    expr(s"size(filter($wColName, x -> array_contains(array($arr), x)))")
  }

  /** Boolean "contains any stopword" — prefer this over
    * `stopwordHits(...) >= 1` when only existence matters:
    * `arrays_overlap` is a codegen'd expression with early exit,
    * where the hit COUNT goes through an interpreted higher-order
    * `filter` lambda (CodegenFallback) whose cost grows with the
    * stopword list. */
  def hasAnyStopword(wColName: String, words: Seq[String]): Column = {
    val arr = words.map(s => s"'$s'").mkString(", ")
    expr(s"arrays_overlap($wColName, array($arr))")
  }

  /** Heuristic language ID by stopword-set voting: `langs` lists
    * (code, stopwords) in PRECEDENCE order — the first language whose
    * hit count is >= every later language's wins; no hits at all is
    * `undCode`. Deterministic by construction (ties resolve to the
    * earlier language). */
  def languageId(wColName: String, langs: Seq[(String, Seq[String])],
      undCode: String = "und"): Column = {
    require(langs.nonEmpty)
    val hits = langs.map { case (code, words) =>
      code -> stopwordHits(wColName, words) }
    val allZero = hits.map(_._2 === 0).reduce(_ && _)
    val ranked = hits.zipWithIndex.init.foldRight(lit(hits.last._1)) {
      case ((((code, h)), i), otherwise) =>
        val later = hits.drop(i + 1).map(_._2)
        when(later.map(h >= _).reduce(_ && _), code).otherwise(otherwise)
    }
    when(allZero, undCode).otherwise(ranked)
  }

  /** Canonicalization preceding exact dedup: lowercase, collapse runs
    * of spaces, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), " +", " "))

  /** Winnowing-style content fingerprint: the minimum md5 over all
    * k-char shingles of the text. Near-identical texts share most
    * shingles, so they collide on the minimum with high probability —
    * grouping on the fingerprint is a cheap near-dup pre-cluster. */
  def minFingerprint(textColName: String, k: Int = 5): Column =
    expr(s"""array_min(transform(
         sequence(1, greatest(length($textColName) - ${k - 1}, 1)),
         i -> md5(substring($textColName, i, $k))))""")

  /** Email addresses matched by the redaction pass. Anchored to word
    * style (lowercase corpus); the same pattern compiles identically
    * under Java regex and RE2-style engines. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Long digit runs (phone/account/card shapes). */
  val LongNumberPattern = "[0-9]{7,}"

  /** PII scrub (the redaction pass a training-data pipeline runs
    * before anything else sees the text): emails → <EMAIL>, 7+ digit
    * runs → <NUM>. Pure codegen'd regexp_replace chain — linear scan,
    * no shuffle; extend with further (pattern, token) pairs as
    * policies grow. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      LongNumberPattern, "<NUM>")
}
