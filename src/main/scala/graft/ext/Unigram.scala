package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style, Kudo 2018) subword tokenizer — the
  * probabilistic sibling of the BPE family (TextAnalysis.bpe*; VERDICT
  * r13 #8): instead of greedy merge rules, a PIECE VOCABULARY with
  * log-probabilities, trained by hard (Viterbi) EM and applied by
  * exact best-path segmentation.
  *
  * Faithful-but-portable design decisions, pinned so the DuckDB mirror
  * reproduces every bit:
  *   - HARD EM (Viterbi counts), not forward-backward expectations:
  *     the E-step assigns each word its single best segmentation under
  *     the current scores and counts pieces along that path — the
  *     standard deterministic approximation, and the one whose state
  *     is integer counts (engine-portable) rather than float marginals.
  *   - Scores are v6-QUANTIZED integer log-probs: lp6 =
  *     floor(ln((n+1)/(total+|V|))·1e6 + 0.5) (Laplace-smoothed so
  *     zero-count single chars keep a finite score). The Viterbi DP
  *     then sums LONGs — exact, associative, tie-behavior identical in
  *     both engines.
  *   - Ties in the DP take the max of struct(score, j): equal-score
  *     paths prefer the larger predecessor index (= shorter final
  *     piece) — one pinned convention, lexicographic struct compare in
  *     both engines.
  *   - Pruning between iterations drops multi-char pieces with zero
  *     Viterbi count; single chars are NEVER dropped (coverage: every
  *     corpus word must segment — the roundtrip law).
  *
  * Shape at 100 TB: ONE corpus-sized pass (the token explode →
  * (word, freq) groupBy, partial-agg'd); everything after is
  * VOCAB-SIZED — the interpreted HOF folds (house rule: never in a
  * corpus hot path, always over the distinct-word table), the
  * per-iteration piece counts, and the driver state (topK + alphabet
  * pieces, the BPE-rules precedent: tokenizer vocabularies are
  * trivially driver-sized). Iteration count is a constant; each
  * E-step is one vocab-sized job, so the EM loop adds no corpus scans
  * beyond the first.
  */
object Unigram {

  /** One vocabulary piece: Viterbi count `n` at the last E-step and the
    * quantized log-prob `lp6` scoring the NEXT segmentation. */
  final case class Piece(piece: String, n: Long, lp6: Long)

  /** Corpus -> (w, freq) distinct-word table: the one corpus-sized pass. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** All substrings of length 1..maxLen counted by corpus frequency
    * (every occurrence counts, weighted by word freq) — the seed pool. */
  def seedCounts(words: DataFrame, maxLen: Int): DataFrame = {
    require(maxLen >= 2 && maxLen <= 8, s"maxLen must be in [2,8]: $maxLen")
    val subs = flatten(transform(sequence(lit(0), length(col("w")) - 1),
      j => transform(sequence(lit(1), least(lit(maxLen), length(col("w")) - j)),
        l => col("w").substr(j + 1, l))))
    words.select(col("freq"), explode(subs).as("piece"))
      .groupBy("piece").agg(sum("freq").as("n"))
  }

  private def lp6(n: Long, total: Long, vocabSize: Int): Long =
    math.floor(math.log((n + 1.0) / (total.toDouble + vocabSize)) * 1e6 + 0.5)
      .toLong

  /** Seed vocabulary: top-K multi-char substrings by (count desc, piece
    * asc) UNION all single chars, Laplace-scored. Driver-sized by
    * construction (K + alphabet). */
  def seedVocab(words: DataFrame, maxLen: Int, topK: Int): Seq[Piece] = {
    require(topK >= 1 && topK <= 100000, s"topK must be in [1,1e5]: $topK")
    val sc = seedCounts(words, maxLen)
    val multi = sc.filter(length(col("piece")) >= 2)
      .orderBy(desc("n"), col("piece")).limit(topK).collect()
    val chars = sc.filter(length(col("piece")) === 1).collect()
    val raw = (multi ++ chars).map(r => (r.getString(0), r.getLong(1)))
    val total = raw.map(_._2).sum
    raw.map { case (p, n) => Piece(p, n, lp6(n, total, raw.length)) }
      .sortBy(_.piece).toSeq
  }

  /** Exact Viterbi segmentation of the distinct-word table under a
    * piece->lp6 vocabulary (inlined as ONE typed map literal — vocab is
    * driver-bounded). Adds `pieces: array<string>`; DP and backtrack are
    * two interpreted folds over word length, vocab-sized per row.
    *
    * Two round-14 performance lessons baked in (192s -> sub-second on
    * 31 distinct words, measured):
    *   - the vocab map is `typedlit`, not `map(lit...)`: interpreted
    *     CreateMap REBUILDS the whole map (2·|V| child evals + alloc)
    *     on EVERY element_at lookup — a typed Literal carries one
    *     prebuilt MapData;
    *   - dp / bounds / pieces are materialized STAGES (the bpeEncode
    *     pass-per-job precedent): CollapseProject would inline dp into
    *     every bounds fold STEP and bounds into every pieces lambda —
    *     interpreted expressions have no subexpression reuse, so the
    *     collapsed form re-evaluates the DP O(len²) times per row. */
  def segment(words: DataFrame, vocab: Seq[Piece], maxLen: Int): DataFrame = {
    require(vocab.nonEmpty, "empty vocabulary")
    val vm = typedlit(vocab.map(p => p.piece -> p.lp6).toMap)
    val w = col("w")
    // dp(i+1) = best struct(score, j) over candidate last-pieces w[j..i)
    val dp = aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(0L).as("s"), lit(-1).as("j"))),
      (acc, i) => concat(acc, array(array_max(filter(
        transform(sequence(greatest(i - maxLen, lit(0)), i - 1),
          j => struct(
            (element_at(acc, j + 1).getField("s") +
              element_at(vm, w.substr(j + 1, i - j))).as("s"),
            j.as("j"))),
        c => c.getField("s").isNotNull)))))
    // walk backpointers from len(w) to 0 (extra steps no-op at 0)
    val bounds = aggregate(
      sequence(lit(1), length(w)),
      array(length(w)),
      (acc, _) => when(element_at(acc, 1) > 0,
        concat(array(element_at(col("__dp"), element_at(acc, 1) + 1)
          .getField("j")), acc)).otherwise(acc))
    val pieces = transform(sequence(lit(1), size(col("__bounds")) - 1),
      k => w.substr(element_at(col("__bounds"), k) + 1,
        element_at(col("__bounds"), k + 1) - element_at(col("__bounds"), k)))
    val s1 = graft.ops.Materialize.stable(
      words.withColumn("__dp", dp), "unigram-dp")
    val s2 = graft.ops.Materialize.stable(
      s1.withColumn("__bounds", bounds), "unigram-bt")
    graft.ops.Materialize.release(s1)
    s2.withColumn("pieces", pieces).drop("__dp", "__bounds")
  }

  /** E-step: freq-weighted piece counts along each word's best path. */
  def viterbiCounts(words: DataFrame, vocab: Seq[Piece],
                    maxLen: Int): DataFrame =
    segment(words, vocab, maxLen)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("n"))

  /** Hard-EM training: seed -> iters x (Viterbi count, prune zero-count
    * multi-char pieces, Laplace re-score). Returns the final vocabulary
    * with its LAST E-step counts. */
  def emTrain(words: DataFrame, maxLen: Int = 4, topK: Int = 40,
              iters: Int = 2): Seq[Piece] = {
    require(iters >= 1 && iters <= 10, s"iters must be in [1,10]: $iters")
    var vocab = seedVocab(words, maxLen, topK)
    for (_ <- 1 to iters) {
      val counts = viterbiCounts(words, vocab, maxLen).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val kept = vocab
        .map(p => (p.piece, counts.getOrElse(p.piece, 0L)))
        .filter { case (p, n) => n > 0 || p.length == 1 }
      val total = kept.map(_._2).sum
      vocab = kept
        .map { case (p, n) => Piece(p, n, lp6(n, total, kept.length)) }
        .sortBy(_.piece)
    }
    vocab
  }

  // ------------------------------------------------------------------
  // DuckDB dual-render (the hilbertCtesSql precedent): the ENTIRE EM
  // chain re-derived in SQL so the oracle never sees an engine value.
  // ------------------------------------------------------------------

  /** The oracle-side unroll bound: words longer than this trip a loud
    * error() in the generated SQL (the engine has no such bound). */
  val SqlUnrollBound = 16

  /** CTE block computing Viterbi piece counts `<p>cnt(piece, n)` plus
    * per-word segmentations `<p>seg(w, freq, pieces)` for words CTE
    * `wordsCte(w, freq)` under vocab CTE `vocabCte(piece, lp6)`.
    *
    * Rendering note (round 14, the hard-won one): this is an UNROLLED
    * chained-CTE DP — one CTE level per position for the forward pass
    * (s_i/b_i columns) and one per step for the backpointer walk —
    * with candidate edges pre-pivoted into a per-word MAP keyed
    * i·100+j. TWO rejected alternatives, both measured wrong/broken on
    * DuckDB 1.0:
    *   1. list_reduce folds (the natural mirror of the engine's
    *      aggregate() HOF): DuckDB 1.0's list_reduce MISALIGNS ROWS in
    *      full-table vectorized plans — the fold ran with another
    *      row's list geometry (word 'customer' got a 5-long word's
    *      backpointers), while single-row and direct-CTE probes of the
    *      same chain were correct; plan-dependent, silent, unfixable
    *      by AS MATERIALIZED boundaries.
    *   2. Lateral column aliases for the unroll in ONE select: aliases
    *      substitute EXPRESSIONS, so s_16 expands 4^16 subtrees — the
    *      binder hangs. Chained CTEs bind each level's columns once.
    * list_transform/list_max/map_extract were verified row-stable and
    * are the only lambda-class constructs kept. */
  def viterbiCntSql(p: String, wordsCte: String, vocabCte: String,
                    maxLen: Int): String = {
    val W = SqlUnrollBound
    def ev(i: Int, j: Int) = s"map_extract(em, ${i * 100 + j})[1]"
    val dps = Seq(
      s"""${p}dp0 AS (
         |  SELECT wd.w, wd.freq, e.em, CAST(0 AS BIGINT) AS s0
         |  FROM ${p}emap e JOIN $wordsCte wd USING (w))""".stripMargin) ++
      (1 to W).map { i =>
        val cands = (math.max(i - maxLen, 0) until i).map { j =>
          s"CASE WHEN s$j IS NOT NULL AND ${ev(i, j)} IS NOT NULL " +
            s"THEN {'s': s$j + ${ev(i, j)}, 'j': CAST($j AS BIGINT)} END"
        }.mkString(", ")
        s"""${p}dp$i AS (
           |  SELECT *, list_max([$cands]) AS b$i,
           |    list_max([$cands])['s'] AS s$i
           |  FROM ${p}dp${i - 1})""".stripMargin
      }
    val bps = (1 to W).map(i => s"b$i['j']").mkString("[", ", ", "]")
    val bts = Seq(
      s"""${p}bt0 AS (
         |  SELECT w, freq, $bps AS bps, CAST(length(w) AS BIGINT) AS p0
         |  FROM ${p}dp$W)""".stripMargin) ++
      (1 to W).map { k =>
        s"""${p}bt$k AS (
           |  SELECT *, CASE WHEN p${k - 1} > 0
           |    THEN bps[CAST(p${k - 1} AS INT)]
           |    ELSE CAST(0 AS BIGINT) END AS p$k
           |  FROM ${p}bt${k - 1})""".stripMargin
      }
    val plist = (0 to W).map(k => s"p$k").mkString("[", ", ", "]")
    (Seq(
      s"""${p}pos AS (
         |  SELECT w, unnest(range(1, length(w) + 1)) AS i FROM $wordsCte),
         |${p}edge AS (
         |  SELECT e.w, e.i, e.j, v.lp6
         |  FROM (SELECT w, i, unnest(range(greatest(i - $maxLen, 0), i)) AS j
         |        FROM ${p}pos) e
         |  JOIN $vocabCte v
         |    ON v.piece = substr(e.w, CAST(e.j AS INT) + 1,
         |                        CAST(e.i - e.j AS INT))),
         |${p}emap AS (
         |  SELECT w, map_from_entries(list({'k': i * 100 + j, 'v': lp6}))
         |    AS em
         |  FROM ${p}edge GROUP BY w)""".stripMargin) ++
      dps ++ bts ++ Seq(
      s"""${p}bnd AS (
         |  SELECT w, freq,
         |    CASE WHEN p$W > 0
         |      THEN error('unigram oracle: word exceeds unroll bound $W')
         |      ELSE list_sort(list_distinct($plist)) END AS bounds
         |  FROM ${p}bt$W),
         |${p}seg AS (
         |  SELECT w, freq,
         |    list_transform(range(1, len(bounds)),
         |      k -> substr(w, CAST(bounds[CAST(k AS INT)] AS INT) + 1,
         |        CAST(bounds[CAST(k AS INT) + 1] - bounds[CAST(k AS INT)]
         |          AS INT))) AS pieces
         |  FROM ${p}bnd),
         |${p}cnt AS (
         |  SELECT piece, CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT freq, unnest(pieces) AS piece FROM ${p}seg)
         |  GROUP BY piece)""".stripMargin)).mkString(",\n")
  }

  /** CTE block rescoring vocab `fromVocab` with counts `${p}cnt` into
    * `${p}v(piece, n, lp6)` — prune zero-count multi-char, Laplace. */
  def rescoreSql(p: String, fromVocab: String): String =
    s"""${p}vraw AS (
       |  SELECT v.piece, CAST(coalesce(c.n, 0) AS BIGINT) AS n
       |  FROM $fromVocab v LEFT JOIN ${p}cnt c USING (piece)
       |  WHERE coalesce(c.n, 0) > 0 OR length(v.piece) = 1),
       |${p}tot AS (SELECT sum(n) AS c, count(*) AS nv FROM ${p}vraw),
       |${p}v AS (
       |  SELECT piece, n,
       |    CAST(floor(ln((CAST(n AS DOUBLE) + 1)
       |      / (CAST(c AS DOUBLE) + nv)) * 1000000 + 0.5) AS BIGINT) AS lp6
       |  FROM ${p}vraw, ${p}tot)""".stripMargin

  /** Seed CTE block: `words(w, freq)`, substring pool, top-K + chars,
    * Laplace-scored `v0(piece, n, lp6)`. `wordsSql` must select (w). */
  def seedSql(wordsSql: String, maxLen: Int, topK: Int): String =
    s"""words AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM ($wordsSql)
       |  GROUP BY w),
       |sub AS (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS n FROM (
       |    SELECT freq,
       |      substr(w, CAST(j AS INT) + 1, CAST(l AS INT)) AS piece
       |    FROM (SELECT w, freq, unnest(range(0, length(w))) AS j
       |          FROM words) a,
       |    LATERAL (SELECT unnest(range(1,
       |      least($maxLen, length(a.w) - CAST(a.j AS INT)) + 1)) AS l) b)
       |  GROUP BY piece),
       |v0raw AS (
       |  SELECT piece, n FROM
       |    (SELECT piece, n FROM sub WHERE length(piece) >= 2
       |     ORDER BY n DESC, piece LIMIT $topK)
       |  UNION ALL
       |  SELECT piece, n FROM sub WHERE length(piece) = 1),
       |v0tot AS (SELECT sum(n) AS c, count(*) AS nv FROM v0raw),
       |v0 AS (
       |  SELECT piece, n,
       |    CAST(floor(ln((CAST(n AS DOUBLE) + 1)
       |      / (CAST(c AS DOUBLE) + nv)) * 1000000 + 0.5) AS BIGINT) AS lp6
       |  FROM v0raw, v0tot)""".stripMargin
}
