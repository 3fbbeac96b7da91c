package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, language ID, quality scoring, and
  * document fingerprinting. Extension surface beyond the reference
  * (SURVEY.md §7.2 step 6); exercised on `documents` fixtures.
  *
  * Everything is a pure column expression (whole-stage codegen, no UDFs),
  * so at 100 TB these run as a single scan-project stage with no shuffle:
  * per-document scores are embarrassingly parallel over input partitions.
  *
  * Determinism contract: all hashing goes through md5 hex (identical
  * lowercase hex in Spark and DuckDB), and all ratios divide exact
  * integers, so results are bit-identical to the SQL oracle.
  */
object TextAnalysis {

  /** 48-bit deterministic hash: first 12 hex chars of md5, parsed base-16.
    * Oracle twin: `CAST('0x' || substr(md5(x),1,12) AS BIGINT)`. */
  def hex48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Whitespace tokenizer (fixture texts are single-space joined). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word runs and individual punctuation marks,
    * the usual pre-tokenizer regex shape. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""\w+|[^\w\s]"""), lit(0)))

  /** Tiny per-language stopword lists for the n-gram/stopword-hit
    * language-ID heuristic. */
  val enStop: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
  val esStop: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "es")
  val deStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "von", "ein")

  /** Number of tokens present in `words` (with multiplicity). */
  def stopHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Language ID by stopword-hit vote; ties break en > es > de, zero
    * hits → "und". NULL text → "und" (every vote comparison would be
    * NULL, which would otherwise fall through to the `otherwise` branch
    * and confidently label a null document "de"). */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = stopHits(t, enStop)
    val es = stopHits(t, esStop)
    val de = stopHits(t, deStop)
    when(text.isNull, lit("und"))
      .when(en + es + de === 0, lit("und"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("""[^\w\s]"""), lit(0))).cast("double") /
      length(text).cast("double")

  /** Ratio of English stopword tokens to all tokens. */
  def stopwordRatio(text: Column): Column =
    stopHits(tokens(text), enStop).cast("double") / tokenCount(text).cast("double")

  /** Mean token length, exact from single-space-joined text:
    * (chars − separators) / tokens. */
  def meanTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - 1)).cast("double") /
      tokenCount(text).cast("double")

  /** Composite quality score in [0,1]:
    * 0.4·stopword_ratio + 0.3·min(tokens/100, 1) + 0.3·(1 − punct_ratio).
    * Mirrored term-by-term in the oracle SQL so double arithmetic is
    * evaluated in the identical order. */
  def qualityScore(text: Column): Column =
    lit(0.4) * stopwordRatio(text) +
      lit(0.3) * least(tokenCount(text).cast("double") / lit(100.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - punctRatio(text))

  /** Text normalization for dedup/tokenization robustness: lowercase,
    * strip punctuation, collapse whitespace runs, trim. Pure codegen'd
    * expression — the cheap map stage that runs before any corpus-wide
    * operator at scale. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), """[^\w\s]""", ""),
      """\s+""", " "))

  /** Corpus vocabulary: token → (document frequency, total count). The
    * canonical wordcount shuffle — one explode + one combinable groupBy
    * on the token; df via count(DISTINCT id) inside the same pass. */
  def vocabulary(df: org.apache.spark.sql.DataFrame,
                 idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    // Row-local tf pass first (native TermStats), then ONE combinable
    // groupBy: doc_freq counts the per-doc-distinct pair rows, term_freq
    // re-sums the per-doc counts. The explode+countDistinct spelling
    // shuffled every token occurrence AND paid the Expand duplication
    // Spark plans for countDistinct next to a plain aggregate.
    graft.util.Partitioning.fanOut(df)
      .select(col(idCol).as("id"),
        explode(graft.functions.TermStats(split(col(textCol), " "))
          .getField("counts")).as("tc"))
      .groupBy(col("tc").getField("term").as("token"))
      .agg(
        count(lit(1)).as("doc_freq"),
        sum(col("tc").getField("tf")).as("term_freq"))

  /** Deterministic stratified sample: k documents per stratum (language,
    * source, ...), ranked by md5 of the id — a content-independent,
    * engine-reproducible "random" order. The per-stratum window is the
    * scale-safe shape (shuffle on the stratum key only); determinism means
    * re-runs of a training-data pipeline select the identical subset. */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame,
                       stratumCol: String, idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Document fingerprint: polynomial rolling hash over per-token 48-bit
    * hashes, mod the Mersenne prime 2^31−1 (keeps every intermediate
    * < 2^49, overflow-free in both engines).
    * Oracle twin: `list_reduce(list_prepend(0::BIGINT, ...), (h,v) ->
    * (h*31+v) % 2147483647)`. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => hex48(t)),
      lit(0L),
      (h, v) => (h * lit(31L) + v) % lit(2147483647L))
}
