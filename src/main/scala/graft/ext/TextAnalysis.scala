package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * portable hashing, language-ID heuristic, quality scoring, fingerprints.
  *
  * Everything here is built-in Catalyst expressions / higher-order functions
  * (whole-stage codegen, no UDFs) and every function has an exact DuckDB SQL
  * equivalent so the oracle can hash-match — including the hash function,
  * which is md5-based rather than Spark's xxhash64 precisely so both engines
  * compute identical values.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (matches DuckDB
    * `list_filter(string_split(text,' '), x -> length(x)>0)`). */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => length(t) > 0)

  /** k-token shingles joined by single spaces; empty array when < k tokens
    * (mirrors DuckDB `range(1, len-1)` emptiness). */
  def shingles(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Portable 60-bit hash: first 15 hex chars of md5, base-16 -> long.
    * DuckDB twin: CAST(CONCAT('0x', substring(md5(x),1,15)) AS BIGINT). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def h60Sql(e: String): String =
    s"CAST(CONCAT('0x', substring(md5($e), 1, 15)) AS BIGINT)"

  /** IEEE-deterministic half-up 6-dp rounding: floor(x·1e6 + 0.5)/1e6,
    * composed only of correctly-rounded double ops, so ANY engine
    * computes identical bits — unlike native round(x, 6), where Spark's
    * exact-BigDecimal HALF_UP and DuckDB's double-space rounding can
    * disagree when x sits on (or within an ulp of) a half-grid boundary.
    * Exists because sf0.1 HAS such a document: doc 1958's average
    * log-prob rounds to −3.410089 vs −3.41009 across engines (q95/q121
    * hash-diverged, round 12). Use for FINAL float outputs whose inputs
    * are already engine-identical; "half-up" here means toward +inf at
    * .5 even for negatives — fine, both engines run the same formula. */
  def round6Portable(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** DuckDB twin of [[round6Portable]]. */
  def round6PortableSql(e: String): String =
    s"floor(($e) * 1000000 + 0.5) / 1000000"

  /** Driver-side twin of [[h60]] for generating portable constants (e.g.
    * LSH hyperplane coefficients) that BOTH engines can also derive. */
  def h60Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  // ---- language ID (n-gram/stopword heuristic) ----

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "en"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** count of tokens that are stopwords of `lang` */
  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => array_contains(
      array(stopwords(lang).map(lit): _*), t)))

  /** Homoglyph confusables: visually-identical Cyrillic/Greek lowercase
    * code points mapped to their Latin lookalikes — the characters a
    * dedup-evasion or spam pass swaps in because `а` (U+0430) renders
    * exactly like `a` (U+0061). 1:1 code-point pairs so ONE `translate`
    * call (codegen'd; DuckDB has the identical function) applies the
    * whole map. Curated from the Unicode confusables list's
    * highest-frequency Latin-script collisions. */
  val ConfusableFrom = "аеорсху" +
    "іјѕԛԝνο"
  val ConfusableTo = "aeopcxyijsqwvo"

  /** Token-aligned dictionary phrase matching — the blocklist/taxonomy
    * scan ("flag docs mentioning any of these k phrases") built as a
    * JOIN instead of k regexes per row: explode (doc, position, token),
    * hash-equi-join on each phrase's FIRST word (the selective probe —
    * most tokens match no phrase and drop immediately), then verify the
    * full phrase with one bounded array-slice compare. Token-aligned by
    * construction, so "rehash join" does NOT match "hash join" — the
    * substring false positive a naive LIKE scan ships. Phrase list
    * broadcasts (require: ≤ 10k phrases); cost is one scan + a
    * broadcast join, independent of k for the non-matching majority.
    * Occurrences may overlap (each start position counts once).
    * Returns (phrase, n_docs, n_hits, doc_id_sum). */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty && phrases.size <= 10000,
      s"phrase list must be 1..10000 entries, got ${phrases.size}")
    val split = phrases.map { p =>
      val ws = p.split(' ').filter(_.nonEmpty).toSeq
      require(ws.nonEmpty, s"blank phrase in dictionary: '$p'")
      (p, ws)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = split.map { case (p, ws) => (p, ws.head, ws, ws.size) }
      .toDF("phrase", "__w1", "__ws", "__len")
    val toksP = docs.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), col("__t"),
        posexplode(col("__t")).as(Seq("__p", "__w")))
    val perDoc = toksP
      .join(broadcast(dict), col("__w") === col("__w1"))
      .filter(slice(col("__t"), col("__p") + 1, col("__len")) === col("__ws"))
      .groupBy("phrase", "doc_id").agg(count(lit(1)).as("__c"))
    perDoc.groupBy("phrase").agg(
      count(lit(1)).as("n_docs"), sum("__c").as("n_hits"),
      sum((pmod(col("doc_id"), lit(1000000007L)) * 2654435761L) % 1000000007L).as("doc_id_sum"))
  }

  /** Keyword-in-context (KWIC) extraction: for every token-aligned
    * occurrence of `phrase`, the surrounding window of `ctx` tokens on
    * each side joined back to a string — what a curation reviewer
    * actually reads when deciding whether a blocklist hit is real.
    * Same candidate shape as [[phraseMatches]] (first-word probe +
    * slice verify), plus one bounded slice for the context. Emits
    * (doc_id, pos — 1-based first-token position, context). */
  def kwic(docs: DataFrame, idCol: String, textCol: String,
           phrase: String, ctx: Int): DataFrame = {
    require(ctx >= 0 && ctx <= 50, s"ctx must be in [0,50]: $ctx")
    val ws = phrase.split(' ').filter(_.nonEmpty).toSeq
    require(ws.nonEmpty, s"blank phrase: '$phrase'")
    val toksP = docs.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), col("__t"),
        posexplode(col("__t")).as(Seq("__p", "__w")))
      .filter(col("__w") === ws.head)
      .filter(slice(col("__t"), col("__p") + 1, lit(ws.size)) ===
        typedlit(ws))
    val start = greatest(col("__p") + 1 - ctx, lit(1))
    val len = col("__p") + ws.size + ctx - start + 1
    toksP.select(col("doc_id"), (col("__p") + 1).as("pos"),
      array_join(slice(col("__t"), start, len), " ").as("context"))
  }

  /** Heaps'-law vocabulary growth curve: distinct vocabulary V(m) at
    * corpus prefixes of m documents (per-mille checkpoints of the doc
    * count, docs ordered by id), plus the fitted log-log slope β —
    * V ≈ K·mᵝ, the law every real corpus follows (β ≈ 0.4–0.6) and a
    * synthetic/templated corpus visibly violates. The curve costs ONE
    * token fold: V(m) counts tokens whose FIRST document (min doc id)
    * falls inside the prefix — min-per-token, then a
    * checkpoint-threshold count; never a per-prefix rescan. Thresholds
    * derive from the doc-id rank cumulative (counts-of-counts); the
    * fit feeds (ln m, ln V) — each ln 6-dp-quantized to v6 — through
    * [[Profile.olsBy]]'s exact cores. Scale note: the checkpoint
    * thresholds rank the doc-id table through one global running
    * window (id-table-sized); at corpus scale derive them with
    * [[graft.ops.Partitioning.contiguousIds]]' bucket-offset pattern
    * instead. Returns one row per checkpoint: (pm, m_docs, vocab,
    * beta, r2) with the fit broadcast onto every row. */
  def heapsLaw(docs: DataFrame, idCol: String, textCol: String,
               pms: Seq[Int] = Seq(125, 250, 375, 500, 625, 750, 875, 1000))
      : DataFrame = {
    require(pms.nonEmpty && pms.forall(p => p >= 1 && p <= 1000),
      s"checkpoints must be per-mille in [1,1000]: $pms")
    val ids = docs.select(col(idCol).cast("long").as("__d"))
    val nDocs = ids.agg(count(lit(1)).as("__n"))
    val runW = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__d")
      .rowsBetween(Long.MinValue, 0)
    // threshold doc id at rank m = (pm * n) div 1000, per checkpoint
    val th = ids.withColumn("__rk", count(lit(1)).over(runW))
      .crossJoin(broadcast(nDocs))
      .select(col("__d"), col("__rk"), col("__n"),
        explode(array(pms.map(p => lit(p)): _*)).as("pm"))
      .withColumn("__m", expr("(pm * __n) div 1000"))
      .filter(col("__rk") >= col("__m") && col("__m") >= 1)
      .groupBy("pm", "__m").agg(min("__d").as("__th"))
    val firstDoc = docs
      .select(col(idCol).cast("long").as("__d"),
        explode(tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(min("__d").as("__fd"))
    val curve = th.join(
      firstDoc.crossJoin(graft.ops.Guards.broadcastIfSmall(
          th.select(col("pm").as("__pm2"), col("__th").as("__th2"))))
        .filter(col("__fd") <= col("__th2"))
        .groupBy(col("__pm2").as("pm")).agg(count(lit(1)).as("vocab")),
      Seq("pm"))
      .select(col("pm"), col("__m").as("m_docs"), col("vocab"))
    val pts = curve.select(lit(1).as("__k"),
      floor(log(col("m_docs").cast("double")) * 1e6 + 0.5)
        .cast("long").as("__x"),
      floor(log(col("vocab").cast("double")) * 1e6 + 0.5)
        .cast("long").as("__y"))
    val fit = Profile.olsBy(pts, col("__k"), col("__x"), col("__y"))
      .select(col("slope").as("beta"), col("r2"))
    curve.crossJoin(broadcast(fit)).orderBy("pm")
  }

  /** Zipf rank-frequency fit over the top-k tokens: the log-log slope
    * of frequency against rank (≈ −1 on natural language; templated or
    * synthetic text bends it) plus the fit quality. Top-k comes from a
    * TakeOrderedAndProject (never a full vocabulary sort), rank is a
    * k-bounded window, each ln is v6-quantized, and the fit runs
    * through [[Profile.olsBy]]'s exact cores. One summary row:
    * (n_ranked, slope, intercept, r2). */
  def zipfFit(docs: DataFrame, textCol: String, k: Int = 100): DataFrame = {
    require(k >= 3 && k <= 100000, s"k must be in [3,100000]: $k")
    val freq = docs.select(explode(tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
    val top = freq.orderBy(col("__c").desc, col("__w").asc).limit(k)
    val ranked = top.withColumn("__r", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0)).orderBy(col("__c").desc, col("__w").asc)))
    val pts = ranked.select(lit(1).as("__k"),
      floor(log(col("__r").cast("double")) * 1e6 + 0.5)
        .cast("long").as("__x"),
      floor(log(col("__c").cast("double")) * 1e6 + 0.5)
        .cast("long").as("__y"))
    Profile.olsBy(pts, col("__k"), col("__x"), col("__y"))
      .select(col("n").as("n_ranked"), col("slope"), col("intercept"),
        col("r2"))
  }

  /** Confusable skeleton: lowercase + homoglyph fold. Two texts with
    * equal skeletons but different raw bytes are the signature of
    * script-swap dedup evasion — dedup on the skeleton, compare raw to
    * flag the evasion. Map-only, one translate op. */
  def confusableSkeleton(c: Column): Column =
    translate(lower(c), ConfusableFrom, ConfusableTo)

  /** argmax over language scores with a fixed precedence tiebreak
    * (en > es > fr > de > zh), expressed as a CASE chain so DuckDB computes
    * the identical decision. */
  def predictLang(sEn: Column, sEs: Column, sFr: Column, sDe: Column, sZh: Column): Column =
    when(sEn >= sEs && sEn >= sFr && sEn >= sDe && sEn >= sZh, "en")
      .when(sEs >= sFr && sEs >= sDe && sEs >= sZh, "es")
      .when(sFr >= sDe && sFr >= sZh, "fr")
      .when(sDe >= sZh, "de")
      .otherwise("zh")

  // ---- quality scoring ----

  /** sum of token lengths via the `aggregate` HOF (codegen, no UDF). */
  def sumTokenLengths(toks: Column): Column =
    aggregate(toks, lit(0), (acc, t) => acc + length(t))

  /** alphabetic-character count of the lowercased text */
  def alphaChars(c: Column): Column =
    length(regexp_replace(lower(c), "[^a-z]", ""))

  /** BPE-ish subword count: runs of letters, runs of digits, single other
    * non-space chars. */
  def bpeishCount(c: Column): Column =
    regexp_count(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** Bag-of-words document fingerprint: md5 over the sorted distinct token
    * set — robust to token order, catches shuffled near-copies. */
  def fingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  // ---- PII scrubbing ----

  /** PII redaction patterns, applied IN ORDER: (name, regex, replacement).
    * Order matters — emails are matched before bare digit runs so an
    * address's digits are attributed to the email pattern, not double-
    * redacted as IDs. The regexes stick to the syntax subset Java regex
    * and RE2 (DuckDB) interpret identically (classes, bounded repeats,
    * \b, \d), so a SQL oracle reproduces every redaction decision. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("id", "\\d{6,}", "<ID>"))

  /** Sequentially scrubbed text: each pattern is replaced (globally) in
    * the output of the previous one. Pure codegen'd regexp_replace chain —
    * map-only at any scale. */
  def piiScrubbed(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (_, re, tok)) =>
      regexp_replace(acc, re, tok) }

  /** Per-pattern redaction counts, measured at each pattern's position in
    * the sequential chain (the email count sees raw text; the ID count
    * sees text with emails/IPs already tokenized — matching exactly what
    * [[piiScrubbed]] replaces). Returns (name -> count column). */
  def piiCounts(c: Column): Seq[(String, Column)] = {
    val staged = piiPatterns.scanLeft(c) { case (acc, (_, re, tok)) =>
      regexp_replace(acc, re, tok) }
    piiPatterns.zip(staged).map { case ((name, re, _), stage) =>
      name -> regexp_count(stage, lit(re)) }
  }

  // ---- deterministic sampling / splitting ----

  /** Fixed-width segmentation: non-overlapping `w`-token chunks re-joined
    * by single spaces, in document order (last chunk may be short). The
    * segmenter feeding [[Dedup.lineDedup]] when a corpus has no newline
    * structure to split on; real corpora pass `split(text, "\n")` instead.
    * Map-only. DuckDB twin: slice + array_to_string over the same range. */
  def segmentsFixed(toks: Column, w: Int): Column = {
    require(w > 0, s"segment width must be positive, got $w")
    when(size(toks) > 0,
      transform(sequence(lit(0), ceil(size(toks) / lit(w.toDouble)).cast("int") - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Overlapping fixed-size token chunks — the RAG / context-window
    * primitive: each document becomes windows of `chunkSize` tokens whose
    * starts step by `chunkSize - overlap`, so consecutive chunks share
    * `overlap` tokens of context (retrieval hits keep their surroundings;
    * training examples don't cut mid-thought at every boundary).
    *
    * Chunk-count law: `nChunks = ceil(max(nTokens - overlap, 1) / step)`.
    * Every token is covered, the LAST chunk may be short, and — unlike the
    * naive "every start < nTokens" rule — no chunk is ever fully contained
    * in its predecessor (with n=chunkSize the naive rule emits a redundant
    * second chunk that is a strict suffix of the first).
    *
    * Map-only: tokenize → explode the start range → slice. No shuffle, no
    * UDF — at 100 TB chunking is a scan-side transform that stays inside
    * whole-stage codegen, and the output inherits the input's
    * partitioning (doc-contiguous chunks, which downstream embedding
    * batches want). Emits one row per chunk:
    * `(idCol, chunk_idx, chunk_text, n_chunk_tokens, n_tokens)`;
    * zero-token documents emit nothing. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap (chunkSize=$chunkSize)")
    val step = chunkSize - overlap
    // zero-token screen as a CHEAP predicate: tokens (split on ' ') is
    // empty iff text is all spaces — `trim != ''` is equivalent, costs no
    // tokenize, and Catalyst pushes it to the scan; filtering on
    // size(toks) > 0 instead gets pushed BELOW the projection and
    // re-tokenizes every row twice (observed in the physical plan)
    df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("chunk_idx", explode(sequence(lit(0),
        ceil(greatest(col("n_tokens") - overlap, lit(1)) / lit(step.toDouble))
          .cast("int") - 1)))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("toks"), col("chunk_idx") * step + 1,
          lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize), col("n_tokens") - col("chunk_idx") * step)
          .as("n_chunk_tokens"),
        col("n_tokens"))
  }

  /** Stable per-row bucket in [0, buckets): hash of a salted key. Unlike
    * `df.sample()` (partition-order-dependent RNG), this is reproducible
    * across runs, engines, and repartitioning — the right primitive for
    * train/val/test splits and mixture sampling in data pipelines. */
  def hashBucket(key: Column, salt: String, buckets: Int = 100): Column =
    h60(concat(lit(salt + ":"), key.cast("string"))) % buckets

  /** Named split by hash-bucket thresholds, e.g. 80/10/10. */
  def split3(key: Column, salt: String, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(key, salt)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Leakage-safe split: hash the GROUP key (domain, source, author), not
    * the row id, so every document of a group lands in the SAME split and
    * near-duplicates within a group can never straddle train/val — the
    * standard guard against eval contamination when a corpus has many
    * near-copies per site. Map-only (the group key is already on the row);
    * split sizes are proportional to GROUP mass, not group count, so a
    * heavy-tailed corpus should audit per-split mass (see q105). */
  def groupSplit(df: DataFrame, groupCol: String, salt: String,
                 trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.withColumn("split", split3(col(groupCol), salt, trainPct, valPct))

  /** Unigram log-probability quality score — the deterministic stand-in
    * for the KenLM-perplexity filter every major corpus pipeline runs
    * (CCNet, Gopher): score(doc) = mean over tokens of ln(tf_corpus/N),
    * where the unigram "model" is the corpus itself (or any reference
    * corpus passed as `model`). Gibberish and OCR noise score far below
    * fluent text.
    *
    * Shape at scale: one tf groupBy over the model corpus (partial-agg),
    * a 1-row total, and an UNHINTED equi-join of the doc tokens to the
    * frequency table on term — the same web-scale-vocabulary rule as
    * tf-idf (never force-broadcast a 10^9-term table; AQE downgrades on
    * toy data). Per-token log-probs round to 6 decimals and sum as
    * DECIMAL, so the per-doc score never depends on aggregation order.
    * Tokens absent from the model are dropped (a smoothing constant is
    * the caller's upstream choice); `n_scored` reports how many scored. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                     model: Option[DataFrame] = None): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val modelTok = model match {
      case None => tok
      case Some(m) => m.select(explode(tokens(col(textCol))).as("term"))
    }
    val freq = modelTok.groupBy("term").agg(count(lit(1)).as("ctf"))
    val total = freq.agg(sum("ctf").as("n_total"))
    tok.join(freq, "term")
      .crossJoin(broadcast(total))
      .withColumn("__lp", round(log(col("ctf").cast("double") / col("n_total")), 6)
        .cast(org.apache.spark.sql.types.DecimalType(20, 6)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_scored"), sum("__lp").as("sum_logp"))
      .withColumn("avg_logp",
        round6Portable(col("sum_logp").cast("double") / col("n_scored")))
  }

  /** Markup/boilerplate stripper — the extract-text step every web-crawl
    * pipeline runs before any quality/dedup signal: drops script/style
    * blocks WITH their contents, then comments, then remaining tags, then
    * decodes the five predefined entities (amp LAST, so double-encoded
    * text decodes one level per pass — sanitizer convention: a decoded
    * `<` can never be re-parsed as markup because tag removal already
    * happened), then collapses whitespace. Pure codegen'd regexp_replace
    * chain: map-only, scan-fused, no UDF; every pattern is RE2-safe (no
    * backreferences) so an engine twin can run the identical program. */
  def stripMarkup(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Per-document Shannon entropy (nats) of the token distribution — the
    * model-free diversity/repetition signal next to [[unigramLogProb]]'s
    * model-based one: template spam and stuck-generation loops score low
    * (mass concentrated on few tokens), fluent prose scores near ln of
    * its vocabulary size. Computed as H = ln N − (Σ n_t·ln n_t)/N so the
    * whole thing is TWO hash aggregates (doc,token) → (doc), both with
    * map-side partials, no window and no per-doc buffer; per-term
    * contributions round to 6 decimals and sum as DECIMAL per the house
    * float-sum rule (aggregation order can never move the hash). */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(20, 6)
    docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("n_t"))
      .groupBy(col(idCol))
      .agg(sum("n_t").as("n_toks"), count(lit(1)).as("n_unique"),
        sum(round(col("n_t") * log(col("n_t").cast("double")), 6).cast(dec))
          .as("__s"))
      .withColumn("entropy",
        round(log(col("n_toks").cast("double")) -
          col("__s").cast("double") / col("n_toks"), 6))
      .drop("__s")
  }

  /** Model-based quality classifier — the "quality filter" step of the
    * GPT-3/CCNet-style curation recipe (seed corpus vs raw crawl),
    * re-expressed as pure aggregation: multinomial naive Bayes with add-1
    * smoothing over whitespace tokens. "Training" is ONE token groupBy
    * (no iterative solver): per-term log-odds
    * ln((tf_pos+1)/(N_pos+V)) - ln((tf_neg+1)/(N_neg+V)), prior
    * ln(n_pos/n_neg) over seed-labeled docs; scoring joins doc tokens to
    * the term table and sums. pred = score > 0.
    *
    * Shape at scale: the term-stats groupBy partial-aggregates map-side;
    * the totals are a 1-row broadcast; the scoring join is UNHINTED (the
    * vocabulary is web-scale — same rule as tf-idf/unigramLogProb). Each
    * per-token contribution rounds to 6 decimals and sums as DECIMAL so
    * the score is aggregation-order-free. Docs with zero tokens drop out
    * (nothing to score). `posCol` is any boolean seed labeling — source
    * membership, a heuristic gate, or hand labels. */
  def nbQualityScore(docsDf: DataFrame, idCol: String, textCol: String,
                     posCol: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(20, 6)
    val lab = docsDf.select(col(idCol), posCol.cast("boolean").as("__pos"),
      col(textCol))
    val tok = lab.select(col(idCol), col("__pos"),
      explode(tokens(col(textCol))).as("term"))
    val stats = tok.groupBy("term").agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("tf_pos"),
      sum(when(col("__pos"), 0L).otherwise(1L)).as("tf_neg"))
    val tot = stats.agg(sum("tf_pos").as("n_pos"), sum("tf_neg").as("n_neg"),
      count(lit(1)).as("v"))
    val lo = stats.crossJoin(broadcast(tot))
      .select(col("term"),
        round(log((col("tf_pos") + 1).cast("double") / (col("n_pos") + col("v"))) -
              log((col("tf_neg") + 1).cast("double") / (col("n_neg") + col("v"))), 6)
          .cast(dec).as("logodds"))
    val prior = lab.agg(
      round(log(sum(when(col("__pos"), 1L).otherwise(0L)).cast("double") /
                sum(when(col("__pos"), 0L).otherwise(1L))), 6)
        .cast(dec).as("prior"))
    tok.join(lo, "term")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum("logodds").as("sum_lo"))
      .crossJoin(broadcast(prior))
      .select(col(idCol), col("n_terms"),
        (col("prior") + col("sum_lo")).cast("double").as("nb_score"),
        when(col("prior") + col("sum_lo") > 0, 1).otherwise(0).as("pred"))
  }

  /** EXACT-quota stratified sampling: precisely `quota` rows per group
    * (or the whole group when smaller), chosen in deterministic hash
    * order — the eval-set constructor, where "about 5%" ([[temperatureMix]]'s
    * expected-rate regime) isn't acceptable and the count must be exact.
    * One window rank per group over (hash, id); the sort is bounded by
    * the GROUP's row count — fine for eval-sized strata, and at
    * corpus-sized groups pre-filter with a hash threshold slightly above
    * the target rate, then exact-rank the survivors. */
  /** Largest-remainder (Hamilton) apportionment of an integer budget
    * across groups proportional to their sizes: quota_i =
    * floor(N·n_i/total) plus one extra seat for the k largest
    * remainders (k = N − Σ floors; ties broken by group value
    * ascending — fully deterministic). The standard way to turn "mix
    * 35% web / 40% books / 25% code" into EXACT per-source sample
    * budgets that sum to N precisely — proportional rounding that
    * never over- or under-shoots the budget.
    *
    * EXACT integer algebra: the scaled remainder N·n_i − q_i·total is
    * an integer, compared without division. Shape at scale: one group
    * fold (map-side partials), then rank + distribute over the
    * groups-sized table (the bounded-cardinality window contract).
    * Σ quota == N is spec-pinned. */
  def apportion(df: DataFrame, groupCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_rows"))
    val tot = g.agg(sum("n_rows").as("__tot"))
    val based = g.crossJoin(broadcast(tot))
      .withColumn("__floor",
        expr(s"($budget * n_rows) div __tot"))
      .withColumn("__rem",
        lit(budget) * col("n_rows") - col("__floor") * col("__tot"))
    val short = based.agg((lit(budget) - sum("__floor")).as("__k"))
    val ranked = based.crossJoin(broadcast(short))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(groupCol).asc)))
    ranked.select(col(groupCol), col("n_rows"),
      (col("__floor") + when(col("__rk") <= col("__k"), 1L).otherwise(0L))
        .as("quota"))
  }

  /** [[apportion]] generalized to CALLER-SUPPLIED integer weights —
    * quota_g ∝ weight_g, largest-remainder integerization, Σ quota ==
    * budget exactly. The statistical-design entry point: feed
    * weight_g = N_g·σ_g and this is Neyman optimal allocation (sample
    * variance-heavy strata harder); feed counts and it degenerates to
    * [[apportion]]. Input: one row per group (group, weight ≥ 0);
    * same bounded groups-sized rank shape. An ALL-ZERO weight total
    * makes the allocation undefined — quotas come back null rather
    * than silently proportional; gate upstream if reachable. */
  def apportionWeighted(weights: DataFrame, groupCol: String,
                        weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val g = weights.select(col(groupCol), col(weightCol).cast("long").as("__w"))
    val tot = g.agg(sum("__w").as("__tot"))
    // budget·weight in decimal(38,0): any long·long product fits in 38
    // digits (< 8.5e37), where raw Long arithmetic silently wraps in
    // Spark (and errors in DuckDB) once weight = N_g·σ_g reaches corpus
    // scale (ADVICE r13). Same for the floor·total remainder term.
    val based = g.crossJoin(broadcast(tot))
      .withColumn("__bw", lit(budget).cast("decimal(19,0)") *
        col("__w").cast("decimal(19,0)"))
      .withColumn("__floor", expr("__bw div __tot"))
      .withColumn("__rem", col("__bw") -
        col("__floor").cast("decimal(19,0)") * col("__tot").cast("decimal(19,0)"))
    val short = based.agg((lit(budget) - sum("__floor")).as("__k"))
    based.crossJoin(broadcast(short))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(groupCol).asc)))
      .select(col(groupCol), col("__w").as(weightCol),
        (col("__floor") + when(col("__rk") <= col("__k"), 1L).otherwise(0L))
          .as("quota"))
  }

  /** Deterministic stratified train/val/test assignment with EXACT
    * per-stratum proportions: within each stratum, rows rank by the
    * salted portable hash (h60 — an engine-reproducible shuffle, the
    * q47/q97 rule: no RNG, so retries/engines/partitionings all assign
    * identically) and the first floor(f_train·n) ranks are `train`, the
    * next ranks through floor((f_train+f_val)·n) are `val`, the rest
    * `test`. Cutoffs are EXACT integer arithmetic — fractions enter as
    * per-mille integers (`trainPm`/`valPm`, e.g. 800/100 = 80%/10%) and
    * the cutoff is (pm·n) div 1000 — so both engines agree on every
    * boundary row (a double multiply could round a cutoff differently).
    *
    * vs the naive global `hash % 10 < 8`: that only approximates the
    * split per stratum (binomial noise — a 50-doc language could land
    * 70/30), while eval sets want exact counts. Scale: one window per
    * stratum (the [[exactQuotaSample]] shape — see
    * exactQuotaSampleAtScale for corpus-sized strata) and a broadcast of
    * stratum counts; appends `split` without dropping columns. */
  def stratifiedSplit(df: DataFrame, stratumCol: String, keyCol: String,
                      trainPm: Int, valPm: Int, salt: String): DataFrame = {
    require(trainPm >= 0 && valPm >= 0 && trainPm + valPm <= 1000,
      s"per-mille fractions must be >= 0 and sum <= 1000, got $trainPm/$valPm")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(h60(concat(lit(salt + ":"), col(keyCol).cast("string"))), col(keyCol))
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    df.join(broadcast(counts), stratumCol)
      .withColumn("__rk", row_number().over(w))
      .withColumn("split",
        when(col("__rk") <= expr(s"($trainPm * __n) div 1000"), "train")
          .when(col("__rk") <= expr(s"((${trainPm + valPm}) * __n) div 1000"), "val")
          .otherwise("test"))
      .drop("__n", "__rk")
  }

  /** Stratified k-fold cross-validation assignment — the eval sibling
    * of [[stratifiedSplit]]: fold = (stratum rank − 1) mod k under the
    * salted hash order, so every stratum's folds differ by at most one
    * row, every fold is usable as a held-out set, and re-deriving fold
    * j on any engine/partitioning/rerun yields the identical
    * assignment (no RNG). Same shape: one per-stratum window over the
    * hash order + nothing else; appends `fold` (0..k−1). */
  def cvFolds(df: DataFrame, stratumCol: String, keyCol: String,
              k: Int, salt: String): DataFrame = {
    require(k >= 2 && k <= 1000, s"k must be in [2,1000]: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(h60(concat(lit(salt + ":"), col(keyCol).cast("string"))),
        col(keyCol))
    df.withColumn("fold",
      ((row_number().over(w) - 1) % k).cast("int"))
  }

  def exactQuotaSample(df: DataFrame, groupCol: String, keyCol: String,
                       quota: Int, salt: String): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(h60(concat(lit(salt + ":"), col(keyCol).cast("string"))), col(keyCol))
    df.withColumn("__graft_qrnk", row_number().over(w))
      .filter(col("__graft_qrnk") <= quota)
      .drop("__graft_qrnk")
  }

  /** [[exactQuotaSample]] for CORPUS-sized groups: identical output, but
    * the per-group window never sees more than ~margin·quota rows.
    *
    * The direct form sorts every group in one window partition — fine for
    * eval-sized strata, a single-reducer sort for a billion-row language
    * group. Here a hash-threshold pre-filter (keep u ≤ margin·quota/n_g,
    * the same u that orders the rank) bounds the window input first. The
    * pre-filter keeps the SMALLEST u values, so whenever a group keeps at
    * least `quota` survivors they provably contain its true top-quota and
    * the rank result is identical. Groups the binomial fluctuation
    * under-fills (n_surv < quota < n_g — rare at margin 1.2, rarer as
    * quota grows) are RESCUED: exactly those groups re-rank over their
    * full rows, so identity holds unconditionally, not just with high
    * probability.
    *
    * Price vs the direct form: the extra per-group count + survivor-count
    * aggregations (group-sized, partial-agg) and re-reading the input for
    * the pre/rescue branches — map-only scans traded for the corpus-sized
    * single-partition sort, the right trade everywhere past eval scale. */
  def exactQuotaSampleAtScale(df: DataFrame, groupCol: String, keyCol: String,
                              quota: Int, salt: String,
                              margin: Double = 1.2): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    require(margin > 1.0, s"margin must be > 1, got $margin")
    val u = (h60(concat(lit(salt + ":"), col(keyCol).cast("string"))).cast("double") + 1.0) /
      math.pow(2, 60)
    val sizes = df.groupBy(groupCol).agg(count(lit(1)).as("__n_g"))
    // Unhinted group-table join: usually broadcast-sized, AQE decides.
    val joined = df.withColumn("__u", u).join(sizes, groupCol)
    val pre = joined.filter(
      col("__u") <= least(lit(1.0), lit(margin * quota) / col("__n_g")))
    val sCounts = pre.groupBy(groupCol).agg(count(lit(1)).as("__n_s"))
    // Deficient: the pre-filter kept fewer than quota rows of a group that
    // HAS at least quota (groups smaller than quota survive whole — the
    // direct form keeps them whole too). Zero-survivor groups are absent
    // from sCounts, hence the left join + coalesce.
    val deficient = sizes.join(sCounts, Seq(groupCol), "left")
      .filter(coalesce(col("__n_s"), lit(0L)) <
        least(lit(quota.toLong), col("__n_g")))
      .select(groupCol)
    val cands = pre.join(deficient, Seq(groupCol), "left_anti")
      .unionByName(joined.join(deficient, Seq(groupCol), "left_semi"))
      .drop("__u", "__n_g")
    exactQuotaSample(cands, groupCol, keyCol, quota, salt)
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis &
    * Spirakis 2006, Inf.Proc.Lett. 97(5)): each row gets the key
    * u^(1/w) — u a hash-derived uniform in (0, 1], w the row's weight —
    * and the global top-k by key IS a weighted sample without
    * replacement. The per-item-weight complement of [[temperatureMix]]'s
    * per-group rates (quality-weighted doc selection, importance
    * sampling).
    *
    * Scale shape: the key is map-only; top-k plans TakeOrderedAndProject
    * (per-partition heaps), never a global sort. Determinism: u comes
    * from the portable h60 (no RNG — reruns, retries, and engines agree);
    * the key is rounded to 6 decimals BEFORE ranking with the row id as
    * tiebreak, so a pow() ulp difference can't reorder the boundary.
    * Rows with weight <= 0 are excluded (a zero-weight item is
    * unsampleable by definition; negative weights are meaningless). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     k: Int, salt: String): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    val u = (h60(concat(lit(salt + ":"), col(idCol).cast("string"))).cast("double") + 1.0) /
      math.pow(2, 60)
    df.filter(weight > 0)
      .withColumn("sample_key", round(pow(u, lit(1.0) / weight.cast("double")), 6))
      .orderBy(desc("sample_key"), col(idCol))
      .limit(k)
  }

  /** Per-GROUP weighted sampling without replacement: [[weightedSample]]'s
    * Efraimidis-Spirakis keys ranked within each group by the k-bounded
    * [[graft.ops.TopK.groupedTopK]] aggregate — exactly k quality-weighted
    * survivors per language/source, with a hot group partial-aggregating
    * to k rows per partition instead of single-reducer sorting. Same
    * determinism contract as the global form (hash-derived u, key rounded
    * to 6 before ranking, id tiebreak). Returns (groupCol, idCol,
    * sample_key, rnk). */
  def weightedSampleByGroup(df: DataFrame, groupCol: String, idCol: String,
                            weight: Column, k: Int, salt: String): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    val u = (h60(concat(lit(salt + ":"), col(idCol).cast("string"))).cast("double") + 1.0) /
      math.pow(2, 60)
    graft.ops.TopK.groupedTopK(
      df.filter(weight > 0)
        .withColumn("sample_key", round(pow(u, lit(1.0) / weight.cast("double")), 6)),
      Seq(groupCol), col("sample_key"), col(idCol), k)
      .select(col(groupCol), col("id").as(idCol),
        col("score").as("sample_key"), col("rnk"))
  }

  /** Temperature-weighted corpus mixing (the multilingual-LM standard,
    * e.g. mT5 §3.1): per-group sampling rates DERIVED from corpus shares —
    * weight w_g ∝ n_g^alpha (alpha < 1 upsamples the tail), target_g =
    * w_g · nTarget, keep-rate_g = min(1, target_g / n_g) — then the same
    * deterministic hash-threshold keep decision as [[hashBucket]] (same
    * rows survive on every run, engine, and partitioning; no RNG).
    *
    * Rates are computed IN-PLAN: one count per group (partial-agg), a
    * 1-row total, both broadcast back onto the stream — no driver
    * collect. The rate is rounded to 6 decimals before thresholding so a
    * pow() ulp difference between engine libms cannot flip a row's keep
    * decision. Returns the input rows that survive, plus their group's
    * `mix_rate`. Rows with a NULL group are excluded (null never
    * equi-joins its rate row); assign an explicit 'unknown' group
    * upstream if they should participate. */
  /** The per-group rate table [[temperatureMix]] derives and joins — split
    * out so callers can materialize rates once (a periodic batch pass) and
    * reuse them, e.g. against a STREAM
    * ([[graft.streaming.StreamOps.mixStream]]). One partial-agg count per
    * group + a 1-row broadcast total; returns (groupCol, mix_rate). */
  def temperatureRates(df: DataFrame, groupCol: String,
                       alpha: Double, nTarget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperature alpha must be in (0, 1], got $alpha")
    require(nTarget > 0, s"nTarget must be positive, got $nTarget")
    val perGroup = df.groupBy(groupCol).agg(count(lit(1)).as("__mix_n"))
    val total = perGroup.agg(
      sum(pow(col("__mix_n"), alpha)).as("__mix_z")) // small: one row per group
    perGroup.crossJoin(broadcast(total))
      .withColumn("mix_rate", round(least(lit(1.0),
        pow(col("__mix_n"), alpha) / col("__mix_z") * nTarget / col("__mix_n")), 6))
      .select(col(groupCol), col("mix_rate"))
  }

  /** The deterministic keep predicate shared by the batch and streaming
    * mixers: portable-hash threshold against a `mix_rate` column.
    * Double-space compare on purpose: a long cast would TRUNCATE in Spark
    * but ROUND in DuckDB on the same rate product. */
  def mixKeep(keyCol: String, salt: String): Column =
    h60(concat(lit(salt + ":"), col(keyCol).cast("string"))) % 1000000 <
      col("mix_rate") * 1000000

  def temperatureMix(df: DataFrame, groupCol: String, keyCol: String,
                     alpha: Double, nTarget: Long, salt: String,
                     maxBroadcastGroups: Long = graft.ops.Guards.MaxBroadcastRows): DataFrame = {
    // Materialized eagerly (group-sized — one row per group) so the
    // corpus-wide rate aggregation runs ONCE: broadcastIfSmall's
    // cardinality probe and the mix join below both read the
    // materialized rows, where the lazy plan paid the full groupBy twice
    // (once for the probe, once inside the join).
    val rates = graft.ops.Materialize.stable(
      temperatureRates(df, groupCol, alpha, nTarget), "temp-rates")
    // The rate table has one row PER GROUP — source/language-sized for the
    // typical call, but the API accepts any groupCol, and per-domain mixing
    // over 10^8 domains must NOT broadcast. broadcastIfSmall probes the
    // bounded prefix and falls back to an unhinted (shuffled) join; the
    // result is identical either way, only the plan changes.
    df.join(graft.ops.Guards.broadcastIfSmall(rates, maxBroadcastGroups), groupCol)
      .filter(mixKeep(keyCol, salt))
  }

  /** Deterministic SEQUENCE PACKING for LLM pretraining: assign every doc
    * a (pack_bucket, pack_bin) so each bin's token total fills `budget`
    * with greedy start-offset packing — the step that turns a document
    * corpus into fixed-length training sequences.
    *
    * Docs are salted into `buckets` independent packing streams by the
    * portable hash, and each stream packs in its deterministic (hash, id)
    * order with a per-bucket running token sum:
    * bin = (cumsum - n_tok) div budget — a doc joins the bin its START
    * offset falls in, so bins tile the token stream in budget-sized
    * stripes: every non-final bin's last doc crosses its stripe boundary
    * (bins 0..k jointly hold >= (k+1)·budget tokens), and no bin exceeds
    * budget + one document (the greedy packing bound; a doc larger than
    * the budget gets a stripe to itself).
    *
    * Scale shape: ONE shuffle by pack_bucket + a per-bucket sort over
    * (id, n_tok) METADATA rows — no global sort, no single partition.
    * Parallelism and per-task sort size are both governed by `buckets`:
    * raise it to ~2-3x total cores (or higher for very large corpora).
    * Same-bucket assignment is independent of `buckets` only through the
    * hash, so pick it per pipeline version, not per run. */
  def packSequences(docs: DataFrame, idCol: String, nTokCol: String,
                    budget: Long, buckets: Int = 64): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pack_bucket").orderBy(col("__h"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.withColumn("__h", h60(concat(lit("pack:"), col(idCol).cast("string"))))
      .withColumn("pack_bucket", (col("__h") % buckets).cast("int"))
      .withColumn("__cum", sum(col(nTokCol)).over(w))
      .withColumn("pack_bin", expr(s"(__cum - $nTokCol) div $budget"))
      .drop("__h", "__cum")
  }

  /** Materialize [[packSequences]]' bin assignments into the actual
    * training sequences: per (pack_bucket, pack_bin), the member documents
    * concatenated in the SAME deterministic (hash, id) pack order, plus
    * doc/token counts. The final step turning a document corpus into
    * fixed-budget training rows.
    *
    * Scale shape: one groupBy on the bin key; per-bin state is bounded by
    * the token BUDGET (+ one overflowing document), never by corpus size —
    * the `collect_list` here is the rare safe one, the same bounded-by-
    * construction argument as lineDedup's per-doc reassembly. The pack
    * order is recomputed from the portable hash (stateless — callers need
    * not thread the internal sort key through), so a rerun, a retry, or
    * another engine concatenates byte-identical sequences. */
  def materializePacks(packed: DataFrame, idCol: String, textCol: String,
                       nTokCol: String, sep: String = " "): DataFrame =
    packed
      .withColumn("__h", h60(concat(lit("pack:"), col(idCol).cast("string"))))
      .groupBy(col("pack_bucket"), col("pack_bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(nTokCol).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("__h"), col(idCol), col(textCol)))),
          s => s.getField(textCol)), sep).as("seq_text"))

  /** BPE pair counts — the counting step of byte-pair-encoding tokenizer
    * training (Sennrich/Haddow/Birch, "Neural Machine Translation of Rare
    * Words with Subword Units", ACL 2016, §3.2): represent each distinct
    * word as its character sequence plus an end-of-word marker and count
    * adjacent symbol pairs weighted by corpus word frequency. The argmax
    * pair is the next merge rule; iterating merge→recount yields the
    * vocabulary. A distributed engine's job at 100 TB is exactly this
    * step: collapse the corpus into the word-frequency table (the ONE
    * data-sized pass) and derive exact pair counts from it — the merge
    * loop then iterates over vocab-sized state, never re-reading text.
    *
    * Shape at scale: one token groupBy (corpus → vocab rows); the pair
    * explosion runs over DISTINCT words only — vocab-sized work however
    * large the corpus — and sums `freq` as the weight. Top-k through
    * orderBy+limit (TakeOrderedAndProject); ties break on the pair string
    * so the ranking is engine-portable. Returns (pair, n). */
  def bpePairCounts(docs: DataFrame, textCol: String,
                    k: Int = 30, eow: String = "</w>"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireEow(eow)
    val wf = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // pair at position i: char_i followed by char_{i+1}, or the marker
    // after the last char; tokens are whitespace-split so the space-joined
    // pair string is unambiguous
    val pairs = transform(sequence(lit(1), length(col("w"))),
      i => concat(col("w").substr(i, lit(1)), lit(" "),
        when(i < length(col("w")), col("w").substr(i + 1, lit(1)))
          .otherwise(lit(eow))))
    wf.select(col("freq"), explode(pairs).as("pair"))
      .groupBy("pair").agg(sum("freq").as("n"))
      .orderBy(desc("n"), col("pair")).limit(k)
  }

  /** Space would break the space-joined pair strings; a single-char
    * marker occurring in the corpus alphabet would make (char, eow)
    * pairs indistinguishable from genuine char pairs (and the DuckDB
    * oracles hardcode '</w>'), so both are rejected loudly. */
  private def requireEow(eow: String): Unit =
    require(eow.length > 1 && !eow.contains(" "),
      s"end-of-word marker must be multi-char and space-free: '$eow'")

  /** One learned BPE merge rule: at `rank` (1-based), the adjacent
    * symbol pair (`left`, `right`) — corpus-weighted count `n` at the
    * time it was chosen — rewrites to `left + right`. */
  final case class BpeMerge(rank: Int, left: String, right: String, n: Long)

  /** One greedy left-to-right merge pass: rewrite the symbol array
    * replacing every non-overlapping adjacent (a, b) with a+b. A fold —
    * greediness makes each position's outcome depend on the previous
    * one, so the pass is inherently sequential WITHIN a word; across
    * words (the parallel axis) it's map-only. One pass is exhaustive: a
    * merge consumes both its symbols, so it can never create a fresh
    * (a, b) adjacency. Interpreted HOF, but only ever run over the
    * DISTINCT-word table (vocab-sized), per the house rule.
    *
    * The accumulator starts EMPTY so `syms` is referenced exactly ONCE:
    * interpreted expressions have no subexpression reuse, so a pass that
    * read its input twice (e.g. seeding the accumulator with
    * slice(syms, 1, 1)) would evaluate the whole upstream expression
    * twice — and bpeEncode NESTS these passes, turning twice into
    * 2^rules (measured: one task wedged 10+ minutes at 8 rules; single
    * reference makes the chain linear in rule count). The And chain
    * short-circuits, so element_at(acc, -1) never touches the empty
    * accumulator under ANSI. */
  private def bpeMergePass(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Word string -> initial symbol array: chars plus the end-of-word
    * marker as a trailing symbol (pairs then match [[bpePairCounts]]). */
  private def bpeInitSyms(w: Column, eow: String): Column =
    concat(transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
      array(lit(eow)))

  private def bpeAdjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => concat(element_at(syms, i), lit(" "), element_at(syms, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** BPE merge-loop TRAINING (Sennrich et al., ACL 2016, §3.2) — the
    * iterated step [[bpePairCounts]] counts once: repeat nMerges times
    * {count adjacent pairs, take the argmax (ties on the pair string),
    * rewrite every word by that merge}. Returns the learned rules in
    * rank order, driver-side (bounded by nMerges — tokenizer vocabularies
    * are 10^4-10^5 rules, trivially driver-sized).
    *
    * Shape at scale: the ONE corpus-sized pass is the token groupBy
    * collapsing the corpus to the (word, freq) table; every round after
    * that is vocab-sized — a pair explode + groupBy over DISTINCT words,
    * a 1-row argmax probe (`limit(1)`, the Guards-bounded-probe idiom),
    * and a map-only merge pass — with the rewritten symbol table
    * re-materialized per round through [[graft.ops.Materialize]] (the
    * CC-loop precedent: round k must not replay rounds 1..k-1; mode knob
    * applies). The sequential round structure is inherent to greedy BPE —
    * each argmax depends on the previous rewrite. Stops early if every
    * word has collapsed to a single symbol. */
  def bpeTrainRules(docs: DataFrame, textCol: String, nMerges: Int,
                    eow: String = "</w>"): Seq[BpeMerge] = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    requireEow(eow)
    // spread BEFORE the first materialization: AQE coalesces the tiny
    // vocab shuffle to few partitions, and every later round's
    // interpreted merge fold inherits that layout — without the spread
    // the whole loop runs its compute on a handful of cores
    var state = graft.ops.Materialize.stable(
      graft.ops.Partitioning.spread(
        docs.select(explode(tokens(col(textCol))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("freq"))
          .withColumn("syms", bpeInitSyms(col("w"), eow))
          .select("freq", "syms")),
      "bpe-s0")
    val rules = Seq.newBuilder[BpeMerge]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      val best = state.select(col("freq"), explode(bpeAdjacentPairs(col("syms"))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("n"))
        .orderBy(desc("n"), col("pair")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Array(a, b) = best(0).getString(0).split(" ", 2)
        rules += BpeMerge(r, a, b, best(0).getLong(1))
        val prev = state
        state = graft.ops.Materialize.stable(
          state.withColumn("syms", bpeMergePass(col("syms"), a, b)), s"bpe-s$r")
        // round r is materialized — round r-1's blocks are superseded;
        // release so the merge loop holds 2 rounds of storage, not nMerges
        graft.ops.Materialize.release(prev)
        r += 1
      }
    }
    // the rules are driver-side — the final state table has no consumer
    graft.ops.Materialize.release(state)
    rules.result()
  }

  /** [[bpeTrainRules]] as a DataFrame (rank, pair, n) for oracle
    * checking — `pair` space-joined like [[bpePairCounts]]' output. */
  def bpeMerges(docs: DataFrame, textCol: String, nMerges: Int,
                eow: String = "</w>"): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    bpeTrainRules(docs, textCol, nMerges, eow)
      .map(m => (m.rank, m.left + " " + m.right, m.n))
      .toDF("rank", "pair", "n")
  }

  /** BPE ENCODE: apply learned merge rules to a corpus — each rule in
    * rank order, one greedy left-to-right pass each (exhaustive, see
    * [[bpeMergePass]]; later merges cannot resurrect an earlier rule's
    * pair because merging consumes both symbols, so rank order is a
    * complete application order). Returns one row per DISTINCT word
    * (w, freq, syms) — encoding runs over the vocab-sized word table
    * however large the corpus, and callers join the word column back to
    * documents (unhinted — vocabulary joins never broadcast) or
    * aggregate subword frequencies directly off `freq`. Encoding a word
    * list trained elsewhere is the same call with the other corpus. */
  def bpeEncode(docs: DataFrame, textCol: String, rules: Seq[BpeMerge],
                eow: String = "</w>"): DataFrame = {
    requireEow(eow)
    val wf = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // spread: the rule chain is interpreted compute over a byte-tiny
    // vocab table — left to AQE it lands on one core. Each pass is
    // materialized like the training loop's rounds: one projection
    // nesting all the folds evaluates lazily level-by-level per row,
    // and the interpreted evaluator's per-level array rebuild made the
    // fused form ~7x slower than pass-per-job at 8 rules (measured at
    // sf0.1: 13s fused vs the training loop's ~2s for identical work).
    rules.sortBy(_.rank).foldLeft(
      graft.ops.Materialize.stable(
        graft.ops.Partitioning.spread(
          wf.withColumn("syms", bpeInitSyms(col("w"), eow))),
        "bpe-enc0")) { (df, m) =>
      val next = graft.ops.Materialize.stable(
        df.withColumn("syms", bpeMergePass(col("syms"), m.left, m.right)),
        s"bpe-enc-r${m.rank}")
      graft.ops.Materialize.release(df) // superseded pass (see bpeTrainRules)
      next
    }
  }

  /** Collocation mining via pointwise mutual information (Church & Hanks,
    * Computational Linguistics 1990): adjacent token pairs scored by
    * PMI = ln( p(ab) / (p(a)·p(b)) ) with p(ab) over the bigram-position
    * total and p(·) over the token total, `minCount` pruning the
    * long-tail noise PMI is notoriously fond of, top-`k` by
    * (pmi DESC, pair). The phrase detector a tokenizer/stopword pipeline
    * consults ("new york" is a unit; "of the" is glue).
    *
    * Shape at scale: one gram pass (tokens + 2-shingles ride the SAME
    * explode), two partial-agg'd groupBys (bigram-sized and vocab-sized),
    * two UNHINTED vocab joins of the bigram table to the unigram counts
    * (the tf-idf rule), 1-row totals broadcast in-plan, TakeOrdered
    * top-k. All counts are exact integers, so the log of the exact ratio
    * is an engine-portable double; rounded 6 dp BEFORE the rank per the
    * rank-stability rule. */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      k: Int = 30, minCount: Long = 5L): DataFrame = {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = tokens(col(textCol))
    // one-split scan fix (round 18): all three tokenize passes below ran
    // on one core each; spread is a no-op on multi-split inputs
    val docsS = graft.ops.Partitioning.spread(docs)
    val uni = docsS.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val nUni = uni.agg(sum("c_w").as("n_uni"))
    val bg = docsS.select(explode(shingles(toks, 2)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val nBg = docsS.select((size(toks) - 1).as("m"))
      .filter(col("m") > 0).agg(sum("m").as("n_bg"))
    bg
      .withColumn("a", split(col("pair"), " ")(0))
      .withColumn("b", split(col("pair"), " ")(1))
      .join(uni.select(col("w").as("a"), col("c_w").as("c_a")), "a")
      .join(uni.select(col("w").as("b"), col("c_w").as("c_b")), "b")
      .crossJoin(broadcast(nBg))
      .crossJoin(broadcast(nUni))
      .withColumn("pmi", round(log(
        (col("c_ab").cast("double") / col("n_bg")) /
          ((col("c_a").cast("double") / col("n_uni")) *
            (col("c_b").cast("double") / col("n_uni")))), 6))
      .select("pair", "c_ab", "pmi")
      .orderBy(desc("pmi"), col("pair")).limit(k)
  }

  /** Hashed unigram+bigram feature stream: one row per gram OCCURRENCE,
    * bucketed by the portable hash into `buckets` bins — the featurization
    * step of DSIR (Xie et al., "Data Selection for Language Models via
    * Importance Resampling", NeurIPS 2023, arXiv:2302.03169). Map-only. */
  private def hashedGramStream(df: DataFrame, idCol: String, textCol: String,
                               buckets: Int, salt: String): DataFrame = {
    val toks = tokens(col(textCol))
    graft.ops.Partitioning.spread(df) // one-split scan fix, round 18
      .select(col(idCol), explode(concat(toks, shingles(toks, 2))).as("__gram"))
      .withColumn("bucket",
        (h60(concat(lit(salt + ":"), col("__gram"))) % buckets).cast("int"))
      .drop("__gram")
  }

  /** DSIR importance weights (arXiv:2302.03169): score every raw-corpus
    * document by how much more likely its hashed-n-gram bag is under the
    * TARGET corpus's feature distribution than under the raw corpus's own —
    * log w(doc) = sum over gram occurrences of ln p_tgt(bucket) −
    * ln p_raw(bucket), add-1 smoothed over the `buckets` bins. Selecting
    * top-weight (or weight-resampled) documents tilts a web-scale crawl
    * toward a quality target (e.g. a curated reference set) without
    * training a classifier.
    *
    * Shape at scale: the raw gram stream — tokenize + shingle + hash over
    * every raw document, the dominant map stage — collapses ONCE into a
    * compact (doc, bucket, n) count table that is MATERIALIZED (eager
    * local checkpoint, the Retrieval.scoreTerms precedent): it would
    * otherwise re-run per consuming branch, because per-branch pushdown
    * and pruning make each branch's exchange canonically different and
    * ReuseExchange never fires (measured round 8: the raw stream ran 2x).
    * Row count is bounded by min(gram occurrences, docs x buckets); the
    * target side collapses to <= `buckets` rows before materializing.
    * Both corpus-count tables are bounded by the bucket knob — the whole
    * point of hashing the features — so the weight table is broadcast BY
    * CONSTRUCTION (no probe needed, unlike the per-domain rate tables).
    * The scoring pass is one broadcast join + one groupBy(doc). Per-gram
    * log ratios round to 6 decimals and sum as DECIMAL (the float-sum
    * rule; n·lw over the count table == the per-occurrence sum exactly);
    * the final cast is conversion-exact in both engines because the 6-dp
    * numerator stays far under 2^53. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 1024,
                  salt: String = "dsir-v1"): DataFrame = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val rawDoc = graft.ops.Materialize.stable(
      hashedGramStream(raw, idCol, textCol, buckets, salt)
        .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("__n")),
      "dsir-raw")
    val tgtC = graft.ops.Materialize.stable(
      hashedGramStream(target, idCol, textCol, buckets, salt)
        .groupBy("bucket").agg(count(lit(1)).as("c_tgt")),
      "dsir-tgt")
    val rawC = rawDoc.groupBy("bucket").agg(sum("__n").as("c_raw"))
    // Keyed on the raw corpus's observed buckets: every scored doc's gram
    // lands in one of them (the scored docs ARE the raw corpus), and
    // target-only buckets can't join to anything. Zero target counts are
    // add-1 smoothed like any other bin.
    val weights = rawC.join(tgtC, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_tgt"))
      .crossJoin(broadcast(rawC.agg(sum("c_raw").as("n_raw"))))
      .crossJoin(broadcast(tgtC.agg(sum("c_tgt").as("n_tgt"))))
      .withColumn("lw", round(
        log((col("c_tgt") + 1).cast("double") / (col("n_tgt") + buckets)) -
          log((col("c_raw") + 1).cast("double") / (col("n_raw") + buckets)), 6)
        .cast(org.apache.spark.sql.types.DecimalType(20, 6)))
      .select("bucket", "lw")
    rawDoc.join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(sum("__n").as("n_feats"),
        sum(col("__n") * col("lw")).cast("double").as("log_weight"))
  }

  /** Interpolated bigram language-model score — [[unigramLogProb]]'s
    * order-2 sibling, one rung closer to the KenLM 5-gram filter CCNet
    * runs: score(doc) = mean over bigram positions of
    * ln(lambda·p(cur|ctx) + (1−lambda)·p(cur)), with p(cur|ctx) =
    * c(ctx,cur)/c(ctx·) from the corpus itself (or a reference `model`).
    * Fluent text rides high-probability transitions; shuffled or
    * boilerplate-stitched text scores near its unigram floor.
    *
    * Shape at scale: unigrams and bigrams ride ONE gram stream (a bigram
    * contains the space a whitespace token cannot), collapsed into one
    * compact (doc, gram, n) count table per corpus and MATERIALIZED
    * (eager local checkpoint, the Retrieval.scoreTerms precedent) — the
    * tokenize/shingle chain would otherwise re-run once per consuming
    * branch (measured round 8: ~4x, the scoring stream plus three
    * frequency tables), because per-branch pushdown defeats
    * ReuseExchange. All three frequency tables (bigram, bigram-start
    * context, unigram) re-aggregate the materialized rows, and all three
    * scoring joins are UNHINTED — a web-scale bigram vocabulary is 10^10+
    * rows, far past any broadcast threshold (the tf-idf vocabulary rule;
    * AQE downgrades on toy corpora). Per-position log-probs round to 6 dp
    * and sum as DECIMAL (n·lp over the count table == the per-position
    * sum exactly). Documents with fewer than two tokens have no bigram
    * positions and drop out (same contract as the gram stream's
    * emptiness). */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                    lambda: Double = 0.75,
                    model: Option[DataFrame] = None): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0, s"lambda must be in (0,1], got $lambda")
    // one tokenize + one shingle pass per corpus, materialized as counts
    def gramCounts(df: DataFrame, cols: Column*): DataFrame = {
      val toks = tokens(col(textCol))
      // spread before the fused tokenize+shingle explode (round 18, opt
      // guide §2.5): a single-split doc table serialized the one
      // corpus-text pass on one core (q95 measured 3.1s/1 task).
      graft.ops.Materialize.stable(
        graft.ops.Partitioning.spread(df)
          .select(cols :+ explode(concat(toks, shingles(toks, 2))).as("g"): _*)
          .groupBy(cols :+ col("g"): _*).agg(count(lit(1)).as("__n")),
        "bigram-grams")
    }
    val isBigram = col("g").contains(" ")
    val docG = gramCounts(docs, col(idCol))
    val modelG = model.map(m => gramCounts(m)).getOrElse(docG.drop(idCol))
    val modelBg = modelG.filter(isBigram)
    val cbg = modelBg.groupBy("g").agg(sum("__n").as("c_bg"))
    // whitespace tokens contain no spaces, so the bigram string splits
    // back into exactly (context, current)
    val cctx = modelBg.withColumn("ctx", split(col("g"), " ")(0))
      .groupBy("ctx").agg(sum("__n").as("c_ctx"))
    val cuni = modelG.filter(!isBigram)
      .groupBy(col("g").as("cur")).agg(sum("__n").as("c_uni"))
    val total = cuni.agg(sum("c_uni").as("n_total"))
    docG.filter(isBigram)
      .withColumn("ctx", split(col("g"), " ")(0))
      .withColumn("cur", split(col("g"), " ")(1))
      .join(cbg, "g")
      .join(cctx, "ctx")
      .join(cuni, "cur")
      .crossJoin(broadcast(total))
      .withColumn("__lp", round(log(
        lit(lambda) * col("c_bg").cast("double") / col("c_ctx") +
          lit(1.0 - lambda) * col("c_uni").cast("double") / col("n_total")), 6)
        .cast(org.apache.spark.sql.types.DecimalType(20, 6)))
      .groupBy(col(idCol))
      .agg(sum("__n").as("n_scored"), sum(col("__n") * col("__lp")).as("sum_lp"))
      .withColumn("avg_lp",
        round6Portable(col("sum_lp").cast("double") / col("n_scored")))
      .drop("sum_lp")
  }

  /** Interpolated Kneser-Ney bigram score — the smoothing that actually
    * ships in KenLM (Heafield 2011) and every n-gram LM used for corpus
    * quality filtering, vs [[bigramLogProb]]'s Jelinek-Mercer mixture:
    *   p_KN(cur|ctx) = (c(ctx,cur) − D)/c(ctx·)
    *                 + D·N1+(ctx,·)/c(ctx·) · N1+(·,cur)/N1+(·,·)
    * The lower-order term is the CONTINUATION probability — how many
    * distinct contexts a word follows, not how often it occurs — which is
    * exactly what separates "Francisco" (frequent, one context) from a
    * genuinely productive word. Self-scored against the corpus every
    * bigram has c ≥ 1 > D, so the discounted term never clips; the
    * max(·,0) guard still matters under an external `model`.
    *
    * Shape at scale: identical economics to [[bigramLogProb]] — ONE
    * materialized (doc, gram, n) count stream; the model tables (bigram
    * counts, context totals + distinct-continuation counts, word
    * continuation counts, one global type count) are all re-aggregations
    * of that compact table; all scoring joins UNHINTED (web-scale bigram
    * vocabulary, the tf-idf rule). N1+ counts are COUNT(*) over the
    * distinct-bigram table — types, not tokens — so every model input is
    * an exact integer and the only floats are the final per-position
    * probability and its 6-dp-rounded log, summed as DECIMAL.
    *
    * Every model-table pass costs LINEAR-in-bigram-TYPES work, and type
    * growth is the operator's scale variable: real crawls grow types
    * Heaps-sublinearly (V ~ N^0.7), but decorrelated/templated synthetic
    * text grows them ~linearly with data (SCALING.md q277's sf1 row
    * names exactly this). `maxTypes` is the loud guard on that axis —
    * counted off the already-materialized type table (one cheap job, no
    * extra shuffle) so a pathological vocabulary fails with a named
    * bound instead of silently eating the model-table passes; raise it
    * deliberately for corpora whose type volume you have sized
    * (VERDICT r15 #4, the matrices' maxGroups discipline). */
  def kneserNeyLogProb(docs: DataFrame, idCol: String, textCol: String,
                       discount: Double = 0.75,
                       maxTypes: Long = 100000000L): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1), got $discount")
    require(maxTypes >= 1, s"maxTypes must be positive, got $maxTypes")
    val toks = tokens(col(textCol))
    val docBg = graft.ops.Materialize.stable(
      graft.ops.Partitioning.spread(docs) // one-split scan fix, round 18
        .select(col(idCol), explode(shingles(toks, 2)).as("g"))
        .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("__n")),
      "kn-bigrams")
    // model tables: all re-aggregations of the compact per-doc count table;
    // the distinct-bigram table itself has FOUR consumers (context totals,
    // continuation counts, type count, the scoring join) — materialize it
    // once at vocabulary size rather than re-shuffling docBg per branch
    val cbg = graft.ops.Materialize.stable(
      docBg.groupBy("g").agg(sum("__n").as("c_bg")), "kn-bigram-types")
    val nTypes = cbg.count() // materialized rows — a cheap scan, no shuffle
    require(nTypes <= maxTypes,
      s"kneserNeyLogProb: $nTypes distinct bigram types exceed " +
        s"maxTypes=$maxTypes — every model-table pass is linear in types " +
        "(templated/decorrelated text grows them ~linearly with data; real " +
        "crawls are Heaps-sublinear). Raise maxTypes deliberately or " +
        "pre-filter the corpus")
    // distinct-bigram rows grouped by context: token count AND type count
    val cctx = cbg.withColumn("ctx", split(col("g"), " ")(0))
      .groupBy("ctx")
      .agg(sum("c_bg").as("c_ctx"), count(lit(1)).as("n1p_ctx"))
    val ccont = cbg.select(split(col("g"), " ")(1).as("cur"))
      .groupBy("cur").agg(count(lit(1)).as("n1p_cur"))
    val ntypes = cbg.agg(count(lit(1)).as("n_types"))
    val d = lit(discount)
    docBg
      .withColumn("ctx", split(col("g"), " ")(0))
      .withColumn("cur", split(col("g"), " ")(1))
      .join(cbg, "g")
      .join(cctx, "ctx")
      .join(ccont, "cur")
      .crossJoin(broadcast(ntypes))
      .withColumn("__lp", round(log(
        greatest(col("c_bg").cast("double") - d, lit(0.0)) / col("c_ctx") +
          d * col("n1p_ctx").cast("double") / col("c_ctx") *
            (col("n1p_cur").cast("double") / col("n_types"))), 6)
        .cast(org.apache.spark.sql.types.DecimalType(20, 6)))
      .groupBy(col(idCol))
      .agg(sum("__n").as("n_scored"), sum(col("__n") * col("__lp")).as("sum_lp"))
      .withColumn("avg_lp",
        round6Portable(col("sum_lp").cast("double") / col("n_scored")))
      .drop("sum_lp")
      .orderBy(col(idCol))
  }

  /** Good-Turing frequency re-estimation (Good 1953) over the corpus
    * unigram table: for each observed count r, the adjusted count
    * r* = (r+1)·N_{r+1}/N_r, where N_r = number of DISTINCT tokens seen
    * exactly r times — plus the unseen-mass estimate p0 = N_1/N that
    * every open-vocabulary LM hands to its OOV bucket. The foundation
    * under Katz backoff and the classic sanity probe for synthetic or
    * template-heavy corpora (natural text's N_r decays smoothly; a
    * boilerplate corpus shows holes that zero out r*).
    *
    * Pure counts-of-counts economics: one token-count shuffle, one
    * count-of-counts regroup (output is |distinct r| rows — hundreds at
    * any corpus size), a 1-row-offset self-join on r+1 and one broadcast
    * totals row. Every input to the r* division is an exact integer;
    * r* where N_{r+1} = 0 is NULL (the classic estimator is undefined
    * there — smoothing the N_r curve is a modeling choice, not this
    * audit's job). */
  def goodTuring(docs: DataFrame, textCol: String): DataFrame = {
    val terms = docs.select(explode(tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val cofc = graft.ops.Materialize.stable(
      terms.groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r")),
      "gt-cofc")
    val tot = cofc.agg(
      sum(col("r") * col("n_r")).as("n_tokens"),
      sum("n_r").as("n_types"),
      max(when(col("r") === 1, col("n_r"))).as("__n1"))
    cofc.join(cofc.select((col("r") - 1).as("r"), col("n_r").as("n_next")),
        Seq("r"), "left")
      .na.fill(0L, Seq("n_next"))
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"), col("n_next"),
        when(col("n_next") > 0, round6Portable(
          (col("r") + lit(1)).cast("double") * col("n_next") / col("n_r")))
          .as("r_star"),
        col("n_tokens"), col("n_types"),
        round6Portable(coalesce(col("__n1"), lit(0L)).cast("double") /
          col("n_tokens")).as("p0"))
      .orderBy("r")
  }

  /** Vocabulary-richness summary: Chao1's lower-bound estimate of the
    * TRUE vocabulary size (Chao 1984: V + N1²/2N2 — the singletons and
    * doubletons predict how many types the corpus hasn't seen yet) and
    * Good's coverage estimate 1 − N1/N ("what fraction of the next
    * shard's tokens will be known words"). The two numbers a corpus
    * grower reads beside q269's Heaps fit: Heaps says how vocabulary
    * GROWS, Chao1 says where it's heading, coverage says how much is
    * already banked. One counts-of-counts pass; all exact integers into
    * two final divisions. */
  def vocabRichness(docs: DataFrame, textCol: String): DataFrame = {
    docs.select(explode(tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("n_tokens"), col("vocab"), col("n1"), col("n2"),
        when(col("n2") > 0, round6Portable(
          col("vocab") + col("n1").cast("double") * col("n1") /
            (lit(2) * col("n2")))).as("chao1"),
        round6Portable(lit(1.0) -
          col("n1").cast("double") / col("n_tokens")).as("coverage"))
  }

  /** Jensen-Shannon divergence between per-source unigram distributions,
    * for every pair of the given sources — the bounded, symmetric
    * corpus-mix diagnostic (0 = identical token mix, ln 2 = disjoint
    * vocabularies) that mixture designers read before setting sampling
    * weights, where KL would be infinite on any one-sided token.
    * JSD(a,b) = ½Σ p_a·ln(p_a/m) + ½Σ p_b·ln(p_b/m), m = (p_a+p_b)/2;
    * one-sided terms contribute ½p·ln 2 through the same formula (the
    * other side's p is exactly 0), so no term is dropped.
    *
    * Shape at scale: ONE (source, token, c) count shuffle over the
    * corpus, filtered to the requested sources; the pair fan-out happens
    * on the COUNT table (|pairs|·vocab rows, never corpus rows) via a
    * broadcast pair list, and per-(pair, token) both sides collapse in
    * one conditional aggregation — no self-join of the corpus. Per-term
    * contributions are quantized to integer picounits (floor(x·1e12+0.5)
    * — exact in doubles for |x| ≤ ln 2) and LONG-summed, so the final
    * divergence is order-independent and engine-identical.
    *
    * COST IS |groups|² PAIRS (`maxGroups` guards, as in [[cosineMatrix]]).
    * Degenerate contract: a pair whose side has no tokens emits nothing —
    * JSD against an empty sample is undefined (its p's are not a
    * distribution), and a fill value would misread as a real divergence. */
  def jsDivergence(docs: DataFrame, groupCol: String, textCol: String,
                   groups: Seq[String], maxGroups: Int = 64): DataFrame = {
    require(groups.size >= 2 && groups.distinct.size == groups.size,
      s"need >= 2 distinct groups, got $groups")
    require(groups.size <= maxGroups,
      s"jsDivergence fans out |groups|^2 = ${groups.size * groups.size} " +
        s"shared-vocab folds (> maxGroups=$maxGroups pairs base); preselect " +
        "top-m sources by volume or raise maxGroups deliberately")
    val cnt = graft.ops.Materialize.stable(
      docs.filter(col(groupCol).isin(groups: _*))
        .select(col(groupCol).as("src"), explode(tokens(col(textCol))).as("t"))
        .groupBy("src", "t").agg(count(lit(1)).as("c")),
      "jsd-counts")
    val totals = cnt.groupBy("src").agg(sum("c").as("n"))
    val sorted = groups.sorted
    val pairs = sorted.zipWithIndex.flatMap { case (a, i) =>
      sorted.drop(i + 1).map(b => (a, b)) }
    import docs.sparkSession.implicits._
    val pairDf = broadcast(pairs.toDF("sa", "sb"))
    // fan out counts to the (tiny) pair list, collapse both sides per term
    val perTerm = cnt.join(pairDf,
        col("src") === col("sa") || col("src") === col("sb"))
      .groupBy("sa", "sb", "t")
      .agg(sum(when(col("src") === col("sa"), col("c"))).as("ca"),
        sum(when(col("src") === col("sb"), col("c"))).as("cb"))
    val withTot = perTerm
      .join(broadcast(totals.select(col("src").as("sa"), col("n").as("na"))), "sa")
      .join(broadcast(totals.select(col("src").as("sb"), col("n").as("nb"))), "sb")
    val pa = col("ca").cast("double") / col("na")
    val pb = col("cb").cast("double") / col("nb")
    val m = (coalesce(pa, lit(0.0)) + coalesce(pb, lit(0.0))) / 2
    val contrib =
      coalesce(when(col("ca") > 0, lit(0.5) * pa * log(pa / m)), lit(0.0)) +
        coalesce(when(col("cb") > 0, lit(0.5) * pb * log(pb / m)), lit(0.0))
    withTot
      .withColumn("__c12", floor(contrib * 1e12 + 0.5).cast("long"))
      .groupBy("sa", "sb")
      .agg(count(lit(1)).as("n_terms_union"),
        sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L))
          .as("n_terms_shared"),
        round6Portable(sum("__c12").cast("double") / 1e12).as("jsd"))
      .orderBy("sa", "sb")
  }

  /** Conditional entropy of the token stream: H(cur|ctx) over corpus
    * bigrams, beside the marginal H(cur) and their difference — the
    * mutual information I(ctx;cur), i.e. how many nats the previous
    * token buys about the next one. THE corpus-level predictability
    * number (natural text ~1-2 nats of MI; shuffled text ~0; template
    * spam near H(cur) itself), complementing q277's per-document score
    * with one corpus row and q266's label-MI with a token-level twin.
    *
    * One bigram-count shuffle (the q95/q277 gram stream), then
    * type-table aggregations: every probability is a ratio of exact
    * integer counts, every per-type term quantizes to integer picounits
    * and LONG-sums (order-independent, engine-identical; |terms| ≤
    * bigram-type count keeps the quantization error ≤ types·5e-13).
    *
    * `maxTypes` bounds the bigram-TYPE stream the entropy terms ride —
    * the same loud guard, for the same reason, as
    * [[kneserNeyLogProb]]'s (see there: Heaps-sublinear real text vs
    * ~linear templated text, SCALING.md q287; VERDICT r15 #4). */
  def conditionalEntropy(docs: DataFrame, textCol: String,
                         maxTypes: Long = 100000000L): DataFrame = {
    require(maxTypes >= 1, s"maxTypes must be positive, got $maxTypes")
    val toks = tokens(col(textCol))
    val cbg = graft.ops.Materialize.stable(
      graft.ops.Partitioning.spread(docs) // one-split scan fix, round 18
        .select(explode(shingles(toks, 2)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c")),
      "condent-bigrams")
    val nT = cbg.count() // materialized rows — a cheap scan, no shuffle
    require(nT <= maxTypes,
      s"conditionalEntropy: $nT distinct bigram types exceed " +
        s"maxTypes=$maxTypes — the per-type entropy terms are linear in " +
        "types (templated/decorrelated text grows them ~linearly with " +
        "data). Raise maxTypes deliberately or pre-filter the corpus")
    val cctx = cbg.withColumn("ctx", split(col("g"), " ")(0))
      .groupBy("ctx").agg(sum("c").as("c_ctx"))
    val tot = broadcast(cbg.agg(sum("c").as("b"), count(lit(1)).as("n_types")))
    // H(cur|ctx) = -sum (c/B)·ln(c/c_ctx), per bigram type
    val hcond = cbg.withColumn("ctx", split(col("g"), " ")(0))
      .join(cctx, "ctx").crossJoin(tot)
      .withColumn("__t12", floor(-(col("c").cast("double") / col("b") *
        log(col("c").cast("double") / col("c_ctx"))) * 1e12 + 0.5).cast("long"))
      .agg(max("b").as("n_bigrams"), max("n_types").as("n_types"),
        sum("__t12").as("__hc12"))
    // H(cur) = -sum (c_cur/B)·ln(c_cur/B), per continuation type
    val hcur = cbg.select(split(col("g"), " ")(1).as("cur"), col("c"))
      .groupBy("cur").agg(sum("c").as("c_cur"))
      .crossJoin(tot)
      .withColumn("__t12", floor(-(col("c_cur").cast("double") / col("b") *
        log(col("c_cur").cast("double") / col("b"))) * 1e12 + 0.5).cast("long"))
      .agg(sum("__t12").as("__hm12"))
    hcond.crossJoin(broadcast(hcur))
      .select(col("n_bigrams"), col("n_types"),
        round6Portable(col("__hm12").cast("double") / 1e12).as("h_cur"),
        round6Portable(col("__hc12").cast("double") / 1e12).as("h_cond"),
        round6Portable((col("__hm12") - col("__hc12")).cast("double") / 1e12)
          .as("mi"))
  }

  /** Pairwise COSINE similarity between source term-frequency vectors —
    * the angular companion to [[jsDivergence]] (JSD reads probability
    * mass, cosine reads direction; a source that is a scaled-up copy of
    * another is cosine-1 but JSD > 0 when their lengths differ). Dot
    * products and norms are exact decimal integers off the shared-term
    * join (the sum-min discipline: the union is never materialized);
    * one sqrt per pair at the end.
    *
    * COST IS |groups|² PAIRS, each a shared-term join over the two
    * sources' type tables — fine at survey-scale source counts, 10⁶
    * pairs at 10³ sources; `maxGroups` is the loud guard (raise it
    * knowingly, or preselect top-m sources by volume first). Every pair
    * is EMITTED even when the two groups share no tokens or a group has
    * no docs (cosine 0, n_shared 0) — callers iterate a full matrix,
    * never missing cells (ADVICE r14). */
  def cosineMatrix(docs: DataFrame, groupCol: String, textCol: String,
                   groups: Seq[String], maxGroups: Int = 64): DataFrame = {
    require(groups.size >= 2 && groups.distinct.size == groups.size,
      s"need >= 2 distinct groups: $groups")
    require(groups.size <= maxGroups,
      s"cosineMatrix fans out |groups|^2 = ${groups.size * groups.size} " +
        s"shared-term joins (> maxGroups=$maxGroups pairs base); preselect " +
        "top-m sources by volume or raise maxGroups deliberately")
    val dec = "decimal(38,0)"
    val cnt = graft.ops.Materialize.stable(
      docs.filter(col(groupCol).isin(groups: _*))
        .select(col(groupCol).as("src"), explode(tokens(col(textCol))).as("t"))
        .groupBy("src", "t").agg(count(lit(1)).as("c")),
      "cosine-counts")
    val norms = cnt.groupBy("src")
      .agg(sum(col("c").cast(dec) * col("c")).as("n2"))
    val sorted = groups.sorted
    val prs = sorted.zipWithIndex.flatMap { case (a, i) =>
      sorted.drop(i + 1).map(b => (a, b)) }
    import docs.sparkSession.implicits._
    val pairDf = broadcast(prs.toDF("sa", "sb"))
    val cells = cnt
      .join(pairDf, col("src") === col("sa") || col("src") === col("sb"))
      .groupBy("sa", "sb", "t")
      .agg(sum(when(col("src") === col("sa"), col("c"))).as("ca"),
        sum(when(col("src") === col("sb"), col("c"))).as("cb"))
      .filter(col("ca").isNotNull && col("cb").isNotNull)
      .groupBy("sa", "sb")
      .agg(count(lit(1)).as("__ns"),
        sum(col("ca").cast(dec) * col("cb")).as("__dot"))
      .join(broadcast(norms.select(col("src").as("sa"), col("n2").as("__na"))),
        "sa")
      .join(broadcast(norms.select(col("src").as("sb"), col("n2").as("__nb"))),
        "sb")
      .select(col("sa"), col("sb"), col("__ns"),
        round6Portable(col("__dot").cast("double") /
          sqrt(col("__na").cast("double") * col("__nb").cast("double")))
          .as("__cos"))
    // full matrix: token-disjoint or empty-group pairs emit 0, not a hole
    pairDf.join(cells, Seq("sa", "sb"), "left")
      .select(col("sa"), col("sb"),
        coalesce(col("__ns"), lit(0L)).as("n_shared"),
        coalesce(col("__cos"), lit(0.0)).as("cosine"))
      .orderBy("sa", "sb")
  }

  /** Pairwise VOCABULARY overlap between sources: |Va ∩ Vb|, Sørensen–
    * Dice 2|∩|/(|Va|+|Vb|) and the overlap coefficient |∩|/min(|Va|,|Vb|)
    * — the TYPE-level mix audit beside the token-level cosine/JSD: two
    * sources can share all their words yet weight them differently
    * (Dice 1, JSD > 0), or share a sublanguage exactly (overlap 1,
    * Dice < 1). Set sizes are exact counts off the distinct-(src, term)
    * table.
    *
    * COST IS |groups|² PAIRS (see [[cosineMatrix]] — same guard, same
    * full-matrix contract: disjoint or empty pairs emit 0 cells, never
    * holes). */
  def vocabOverlapMatrix(docs: DataFrame, groupCol: String, textCol: String,
                         groups: Seq[String], maxGroups: Int = 64): DataFrame = {
    require(groups.size >= 2 && groups.distinct.size == groups.size,
      s"need >= 2 distinct groups: $groups")
    require(groups.size <= maxGroups,
      s"vocabOverlapMatrix fans out |groups|^2 = ${groups.size * groups.size} " +
        s"type-table joins (> maxGroups=$maxGroups pairs base); preselect " +
        "top-m sources by volume or raise maxGroups deliberately")
    val cnt = graft.ops.Materialize.stable(
      docs.filter(col(groupCol).isin(groups: _*))
        .select(col(groupCol).as("src"), explode(tokens(col(textCol))).as("t"))
        .distinct(),
      "vocab-types")
    val sizes = cnt.groupBy("src").agg(count(lit(1)).as("v"))
    val sorted = groups.sorted
    val prs = sorted.zipWithIndex.flatMap { case (a, i) =>
      sorted.drop(i + 1).map(b => (a, b)) }
    import docs.sparkSession.implicits._
    val pairDf = broadcast(prs.toDF("sa", "sb"))
    val inter = cnt
      .join(pairDf, col("src") === col("sa") || col("src") === col("sb"))
      .groupBy("sa", "sb", "t").agg(count(lit(1)).as("__n"))
      .filter(col("__n") === 2)
      .groupBy("sa", "sb").agg(count(lit(1)).as("__nc"))
    // full matrix: pairs with no shared types (or an empty group) emit
    // 0-cells; degenerate 0/0 ratios read 0, not null
    pairDf.join(inter, Seq("sa", "sb"), "left")
      .join(broadcast(sizes.select(col("src").as("sa"), col("v").as("__va"))),
        Seq("sa"), "left")
      .join(broadcast(sizes.select(col("src").as("sb"), col("v").as("__vb"))),
        Seq("sb"), "left")
      .select(col("sa"), col("sb"),
        coalesce(col("__va"), lit(0L)).as("v_a"),
        coalesce(col("__vb"), lit(0L)).as("v_b"),
        coalesce(col("__nc"), lit(0L)).as("n_common"))
      .select(col("sa"), col("sb"), col("v_a"), col("v_b"), col("n_common"),
        round6Portable(when(col("v_a") + col("v_b") > 0,
          lit(2.0) * col("n_common") / (col("v_a") + col("v_b")))
          .otherwise(lit(0.0))).as("dice"),
        round6Portable(when(least(col("v_a"), col("v_b")) > 0,
          col("n_common").cast("double") / least(col("v_a"), col("v_b")))
          .otherwise(lit(0.0))).as("overlap"))
      .orderBy("sa", "sb")
  }

  /** Gries' deviation-of-proportions dispersion (Gries 2008): per term,
    * DP = ½·Σ_s |c_{t,s}/c_t − w_s| with w_s = source s's token share —
    * 0 when the term's occurrences mirror the corpus layout, →1 when it
    * bursts from one source. THE corpus-linguistics complement to raw
    * frequency ("whale" can out-count "however" from one Moby-Dick
    * shard), and the burstiness triage a mixture designer reads next to
    * q281's JSD: JSD says two SOURCES differ, DP names WHICH TERMS.
    *
    * Sources a term never appears in contribute |0 − w_s| = w_s, summed
    * CLOSED-FORM as 1 − Σ_{present} w_s — the absent cells are never
    * materialized, so the work stays |present cells|, not |terms|·|sources|.
    * Per-cell deviations and the source shares quantize to integer
    * picounits and LONG-sum (the q281 discipline): order-independent,
    * engine-identical. Output: the `topK` most-bursting terms at
    * count ≥ minCount, (dp DESC, term) deterministic. */
  def dispersion(docs: DataFrame, groupCol: String, textCol: String,
                 minCount: Long = 20, topK: Int = 50): DataFrame = {
    require(minCount >= 1 && topK >= 1, s"bad args: $minCount, $topK")
    val cnt = graft.ops.Materialize.stable(
      docs.select(col(groupCol).as("src"), explode(tokens(col(textCol))).as("t"))
        .groupBy("src", "t").agg(count(lit(1)).as("c")),
      "dispersion-counts")
    val srcTot = cnt.groupBy("src").agg(sum("c").as("n_s"))
    val tot = srcTot.agg(sum("n_s").as("n_total"))
    val termTot = cnt.groupBy("t").agg(sum("c").as("c_t"))
    val w = col("n_s").cast("double") / col("n_total")
    val dev = abs(col("c").cast("double") / col("c_t") - w)
    cnt
      .join(termTot.filter(col("c_t") >= minCount), "t")
      .join(broadcast(srcTot), "src")
      .crossJoin(broadcast(tot))
      .withColumn("__d12", floor(dev * 1e12 + 0.5).cast("long"))
      .withColumn("__w12", floor(w * 1e12 + 0.5).cast("long"))
      .groupBy(col("t").as("term"), col("c_t"))
      .agg(count(lit(1)).as("n_sources"),
        (sum("__d12") + (lit(1000000000000L) - sum("__w12"))).as("__dp12"))
      .select(col("term"), col("c_t"), col("n_sources"),
        round6Portable(col("__dp12").cast("double") / 1e12 / 2).as("dp"))
      .orderBy(col("dp").desc, col("term"))
      .limit(topK)
  }
}
