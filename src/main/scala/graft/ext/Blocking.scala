package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Normalize

/** Blocking-scheme evaluation for record linkage — the measurement that
  * justifies (or indicts) every pruned fuzzy engine in this repo.
  *
  * A blocking scheme is a cheap pair predicate (same first char, length
  * within the edit bound, shared character q-gram, …) used to avoid the
  * full probe x data product. Its quality is two numbers, both defined
  * against exhaustive ground truth:
  *   - reduction ratio  = 1 − candidates / total_pairs (work avoided);
  *   - pairs completeness = retained_true_matches / true_matches
  *     (recall of the block — 1.0 means the prune is LOSSLESS, which is
  *     the claim q02/q150/q155 make via the length band).
  *
  * Like [[Dedup.allPairsExact]], this is an EXHAUSTIVE auditor: ground
  * truth needs true distances on the full product, so the operator is
  * run on a deterministic probe sample at scale (`probeHashMod`, the
  * portable-h60 filter — no RNG, both engines can reproduce the sample)
  * rather than on every probe. One pass computes every scheme's counts
  * as conditional aggregates (single 1-row aggregate, map-side partials;
  * per-side features like q-gram sets are projected BEFORE the join so
  * the per-pair work is one codegen'd predicate each), then the 1-row
  * result is exploded to one row per scheme — no second scan.
  */
object Blocking {

  /** name -> pair predicate over the two NORMALIZED string columns. */
  final case class Scheme(name: String, pred: (Column, Column) => Column)

  /** Character 3-gram set of a normalized string column; empty array
    * below 3 chars (Spark `sequence` would count DOWN on a negative
    * span, so the short case is guarded explicitly). */
  def grams3(c: Column): Column =
    when(length(c) >= 3,
      transform(sequence(lit(1), length(c) - 2), i => c.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  /** The standard scheme set audited by q174: the length band the pruned
    * engines actually use, two prefix blocks, and a shared-3-gram block. */
  def standardSchemes(threshold: Int): Seq[Scheme] = Seq(
    Scheme("len_band", (s, m) => abs(length(s) - length(m)) <= threshold),
    Scheme("prefix1", (s, m) => s.substr(1, 1) === m.substr(1, 1)),
    Scheme("prefix2", (s, m) => s.substr(1, 2) === m.substr(1, 2)),
    Scheme("qgram3", (s, m) => arrays_overlap(grams3(s), grams3(m))))

  /** One row per scheme: candidates, retained, total_pairs, true_matches,
    * reduction_ratio, completeness. `probeHashMod` keeps every probe
    * whose h60 ≡ 0 (mod m) — the deterministic sample both engines agree
    * on; 1 = exhaustive. */
  def audit(probes: DataFrame, probeCol: String,
            data: DataFrame, dataCol: String,
            threshold: Int, schemes: Seq[Scheme],
            probeHashMod: Int = 1): DataFrame = {
    require(schemes.nonEmpty, "audit needs at least one scheme")
    require(probeHashMod >= 1, s"probeHashMod must be >= 1, got $probeHashMod")
    val s = Normalize.norm(col(probeCol))
    val p = probes.select(s.as("s"), grams3(s).as("s_g3")).distinct()
      .filter(pmod(TextAnalysis.h60(col("s")), lit(probeHashMod)) === 0)
    val m = Normalize.norm(col(dataCol))
    // spread the streamed side (round 18, opt guide §2.5): a one-split
    // data table pinned the whole probe × data predicate scan to one
    // core (q174 measured 2.9s/1 task). No-op on multi-split inputs.
    val d = graft.ops.Partitioning.spread(data)
      .select(m.as("m"), grams3(m).as("m_g3"))
    // grams are precomputed per SIDE; per pair only the predicates run.
    val pairs = broadcast(p).crossJoin(d)
      .withColumn("im", levenshtein(col("s"), col("m")) <= threshold)
    val aggCols =
      Seq(count(lit(1)).as("total_pairs"),
        count(when(col("im"), 1)).as("true_matches")) ++
      schemes.zipWithIndex.flatMap { case (sch, i) =>
        val b = sch.pred(col("s"), col("m"))
        Seq(count(when(b, 1)).as(s"c_$i"),
          count(when(b && col("im"), 1)).as(s"r_$i"))
      }
    val one = pairs.agg(aggCols.head, aggCols.tail: _*)
    val rows = array(schemes.zipWithIndex.map { case (sch, i) =>
      struct(lit(sch.name).as("scheme"), col(s"c_$i").as("candidates"),
        col(s"r_$i").as("retained"))
    }: _*)
    one.select(explode(rows).as("x"), col("total_pairs"), col("true_matches"))
      .select(col("x.scheme").as("scheme"),
        col("x.candidates").as("candidates"), col("x.retained").as("retained"),
        col("total_pairs"), col("true_matches"),
        (lit(1.0) - col("x.candidates") / col("total_pairs"))
          .as("reduction_ratio"),
        (col("x.retained") / col("true_matches")).as("completeness"))
  }

  /** Golden-record survivorship — the merge step AFTER matching/blocking
    * has clustered records of one entity: per entity key, each value
    * column independently takes its value from the FIRST row (in
    * `orderCols` precedence — source priority, then a deterministic
    * tiebreak) where that column is non-null. Column-level survivorship,
    * not row-level: a high-priority source missing one field yields that
    * field to the next source instead of nulling the golden record —
    * the difference from [[Dedup]]'s keepBest, which keeps one whole row.
    *
    * Shape at scale: NO window, NO sort — each column's survivor is
    * min(struct(orderCols..., value)) over rows where the value is
    * non-null (nulls drop out of MIN via the when-guard), a plain
    * aggregate with map-side partials; one shuffle on the entity key
    * carries one partially-folded struct per column. `orderCols` must be
    * non-null and total (enforce with a tiebreak id) or two rows tied on
    * precedence could surface either value. Also emits n_rows (cluster
    * size) and, per column, the surviving row's first precedence column
    * (`<col>_pri`) — the provenance a survivorship audit wants. */
  def goldenRecord(records: DataFrame, keyCol: String,
                   orderCols: Seq[String],
                   valueCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "goldenRecord needs precedence columns")
    require(valueCols.nonEmpty, "goldenRecord needs value columns")
    val prec = orderCols.map(col)
    val aggs = count(lit(1)).as("n_rows") +: valueCols.flatMap { c =>
      val winner = min(when(col(c).isNotNull,
        struct(prec :+ col(c).as("__v"): _*))).as(s"__w_$c")
      Seq(winner)
    }
    val folded = records.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    folded.select(col(keyCol) +: col("n_rows") +: valueCols.flatMap { c =>
      Seq(col(s"__w_$c.__v").as(c),
        col(s"__w_$c.${orderCols.head}").as(s"${c}_pri"))
    }: _*)
  }

  /** Fellegi–Sunter match-weight estimation (Fellegi & Sunter 1969;
    * the probabilistic-linkage standard behind Splink/RecordLinkage):
    * from LABELED candidate pairs, estimate per comparison field k
    *   m_k = P(field agrees | pair is a match)
    *   u_k = P(field agrees | pair is a non-match)
    * and the log-likelihood-ratio weights a linker scores with:
    *   w_agree = log2(m/u),  w_disagree = log2((1−m)/(1−u)).
    * Inputs: `pairs` (one row per candidate pair), `isMatch` (the
    * ground-truth label column), and named agreement predicates. Laplace
    * smoothing (add-1 over add-2) keeps every ratio finite on degenerate
    * fields — m and u land strictly inside (0, 1).
    *
    * Shape at scale: ONE conditional-aggregate pass over the pairs (a
    * 1-row aggregate with map-side partials — 2 sums per field + 2
    * totals), then the 1-row result explodes to one row per field; the
    * pair stream itself is whatever blocking produced it (never built
    * here), so the estimator adds no join and no second scan. All
    * probability cores are exact BIGINT counts; each output float is ONE
    * double division (m, u) or the ln-ratio chain rounded at 6 dp —
    * portable per the q197/q221 precedent.
    *
    * Reference framing: the fuzzy engine (main.py:181-289) hard-codes
    * its match rule; FS weights are how a production linker LEARNS the
    * per-field evidence instead. */
  def fsWeights(pairs: DataFrame, isMatch: Column,
                fields: Seq[(String, Column)]): DataFrame = {
    val one = fsCounts(pairs, isMatch, fields)
    val fieldRows = fields.map { case (name, _) =>
      val mk = fsMProb(name)
      val uk = fsUProb(name)
      struct(lit(name).as("field"),
        col(s"__ma_$name").as("n_m_agree"), col(s"__ua_$name").as("n_u_agree"),
        TextAnalysis.round6Portable(mk).as("m_prob"),
        TextAnalysis.round6Portable(uk).as("u_prob"),
        fsW(mk, uk).as("w_agree"),
        fsW(lit(1.0) - mk, lit(1.0) - uk).as("w_disagree"))
    }
    one.select(col("n_m"), col("n_u"),
        explode(array(fieldRows: _*)).as("f"))
      .select(col("f.field").as("field"), col("n_m"), col("n_u"),
        col("f.n_m_agree"), col("f.n_u_agree"), col("f.m_prob"),
        col("f.u_prob"), col("f.w_agree"), col("f.w_disagree"))
  }

  /** The 1-ROW pivoted form of [[fsWeights]]: per field f, columns
    * `wa_f`/`wd_f` (agree/disagree log2 weights, identical formulas) —
    * exactly what a scorer broadcasts onto candidates.
    *
    * Exists for a PLAN reason, not a convenience one: re-pivoting
    * [[fsWeights]]' exploded rows with max(CASE) re-aggregates through
    * a `Generate explode(array(struct(...)))` whose generated code is
    * large enough to knock the WHOLE stage out of whole-stage codegen —
    * including the upstream pair-stream partial aggregate, whose
    * levenshtein ground-truth predicate then runs INTERPRETED (~50×:
    * 49s vs 1s on the 33M-pair q232 stream). This shape is one
    * Project over the counts fold — no Generate anywhere, codegen
    * stays on (PlanSpec pins the `*(N) ... partial_sum(... levenshtein`
    * line). */
  def fsWeightsWide(pairs: DataFrame, isMatch: Column,
                    fields: Seq[(String, Column)]): DataFrame = {
    val one = fsCounts(pairs, isMatch, fields)
    val outCols = fields.flatMap { case (name, _) =>
      val mk = fsMProb(name)
      val uk = fsUProb(name)
      Seq(fsW(mk, uk).as(s"wa_$name"),
        fsW(lit(1.0) - mk, lit(1.0) - uk).as(s"wd_$name"))
    }
    one.select(col("n_m") +: col("n_u") +: outCols: _*)
  }

  /** Shared counts fold of the FS estimator: ONE pass over the pair
    * stream, 2 + 2·|fields| conditional sums with map-side partials. */
  private def fsCounts(pairs: DataFrame, isMatch: Column,
                       fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty, "fsWeights needs at least one field")
    val m = isMatch.cast("boolean")
    val aggs =
      sum(when(m, 1L).otherwise(0L)).as("n_m") +:
      sum(when(!m, 1L).otherwise(0L)).as("n_u") +:
      fields.flatMap { case (name, agree) => Seq(
        sum(when(m && agree, 1L).otherwise(0L)).as(s"__ma_$name"),
        sum(when(!m && agree, 1L).otherwise(0L)).as(s"__ua_$name")) }
    pairs.agg(aggs.head, aggs.tail: _*)
  }

  private def fsMProb(name: String): Column =
    (col(s"__ma_$name") + 1).cast("double") / (col("n_m") + 2)
  private def fsUProb(name: String): Column =
    (col(s"__ua_$name") + 1).cast("double") / (col("n_u") + 2)
  private def fsW(p: Column, q: Column): Column =
    TextAnalysis.round6Portable((log(p) - log(q)) / 0.6931471805599453)

  /** Majority-vote reconciliation across replicas — [[goldenRecord]]'s
    * sibling for the N-COPIES regime (three ingestion mirrors, a
    * re-crawl beside two cached copies): per (key, column), the value
    * the most replicas agree on. Ties (including all-distinct) break
    * to the LARGEST candidate value string — deterministic and
    * engine-portable — and are flagged: n_top = votes for the winner,
    * n_distinct = candidate count, so a 2-1 split (n_distinct 2) and
    * an unresolved 1-1-1 (n_distinct 3, n_top 1) are visible to the
    * caller's quorum policy. NULLs don't vote. Shape: one explode to
    * (key, column, value) — map-only — then TWO key-domain folds with
    * map-side partials ((key, col, value) counts → argmax); never a
    * window, never a replica×replica join. Returns one row per
    * (key, column): (key, column, resolved, n_top, n_distinct). */
  def majorityVote(replicas: DataFrame, keyCol: String,
                   valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "majorityVote needs at least one column")
    val kv = replicas.select(col(keyCol).as("key"), explode(map(
      valueCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
      .as(Seq("column", "value")))
      .filter(col("value").isNotNull)
    kv.groupBy("key", "column", "value").agg(count(lit(1)).as("__n"))
      .groupBy("key", "column")
      .agg(max(struct(col("__n"), col("value"))).as("__top"),
        count(lit(1)).as("n_distinct"))
      .select(col("key"), col("column"),
        col("__top.value").as("resolved"),
        col("__top.__n").as("n_top"), col("n_distinct"))
  }

  /** The SymSpell delete-1 neighborhood of a string: the string itself
    * plus every single-code-point deletion — |s|+1 keys. Two strings at
    * Damerau–Levenshtein ≤ 1 ALWAYS share a key (equal → s itself;
    * substitution/transposition → delete the touched position(s) on
    * each side; insert/delete → the shorter string IS one of the
    * longer's deletions), so a delete-1 equi-join is a COMPLETE
    * candidate generator for DL ≤ 1. Empty strings keep just
    * themselves. */
  def delete1Keys(s: Column): Column =
    when(length(s) > 0, array_distinct(concat(array(s),
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))))
      .otherwise(array(s))

  /** SymSpell-style exact DL ≤ 1 self-join (Garbe's delete-index made
    * distributed): explode each string's delete-1 keys, equi-join on
    * the key, verify survivors with the exact Damerau–Levenshtein
    * kernel. vs the q-gram/banded families: the index is |s|+1 SHORT
    * keys per row with a completeness PROOF at distance 1 — no
    * recall knob, no length bands — at the price of being pinned to
    * distance 1 (the spell-correction/near-key regime). Both the
    * candidate keys and the verify kernel are codegen'd; the join is a
    * plain hash equi-join; output is exact. Requires unique comparable
    * ids; emits each unordered pair once (id_a < id_b) with its dl. */
  def delete1SelfJoin(df: DataFrame, idCol: String,
                      strCol: String): DataFrame = {
    // materialized ONCE: both sides of the self-join read the delete-1
    // key expansion — lazily each side re-runs the O(len²)-per-row
    // explode over the corpus (VERDICT r16 #5 sweep)
    val k0 = graft.ops.Materialize.stable(
      df.select(col(idCol).as("__id"), col(strCol).as("__s"),
        explode(delete1Keys(col(strCol))).as("__k")),
      "delete1-keys")
    def keyed(tag: String) = k0.select(col("__id").as(s"id_$tag"),
      col("__s").as(s"s_$tag"), col("__k"))
    keyed("a").join(keyed("b"), "__k")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "s_a", "id_b", "s_b").distinct()
      .withColumn("dl", graft.functions.TextExprs
        .damerauLevenshtein(col("s_a"), col("s_b")).cast("int"))
      .filter(col("dl") <= 1)
  }

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo 1995): sort
    * the corpus by a blocking key and pair every row with its `w`
    * successors in that order — the classic sliding-window alternative
    * to equality blocking, catching near-matches that share no exact
    * block value.
    *
    * Scale shape — NO global sort, NO full window: global ranks come
    * from the [[graft.ops.Partitioning.contiguousIds]] two-phase
    * bucket-offset pattern, but ordered by (key, id) with the bucket a
    * MONOTONE prefix of the key (`bucketOf`, default first char), so
    * (bucket, key, id) order == (key, id) order and each rank window is
    * bounded by its bucket; per-bucket offsets are a bucket-count-sized
    * broadcast. Pairing is then an EQUI-join on the rank block
    * floor(rank/w): row a meets block g and g+1 only (any successor
    * within w lives there), filtered to 1 <= rank_b − rank_a <= w — the
    * join fans each row out exactly twice regardless of corpus size.
    * `idCol` must be unique (rank ties would be order-unstable).
    * Emits (id_a, key_a, id_b, key_b, gap); gap = rank distance. */
  def sortedNeighborhood(df: DataFrame, keyCol: String, idCol: String,
                         w: Int,
                         bucketOf: Column => Column = _.substr(1, 1)): DataFrame = {
    require(w >= 1, s"sortedNeighborhood needs window >= 1, got $w")
    val local = df.select(col(idCol).as("__id"), col(keyCol).as("__k"))
      .withColumn("__b", bucketOf(col("__k")))
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__b")
          .orderBy("__k", "__id")))
    val offsets = local.groupBy("__b").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
          .orderBy("__b").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select("__b", "__off")
    val ranked = local.join(broadcast(offsets), "__b")
      .select(col("__id"), col("__k"), (col("__off") + col("__r") - 1).as("__g"))
    val blk = expr(s"__g div $w")
    val a = ranked.select(col("__id").as("id_a"), col("__k").as("key_a"),
        col("__g").as("__ga"), explode(array(blk, blk + 1)).as("__blk"))
    val b = ranked.select(col("__id").as("id_b"), col("__k").as("key_b"),
      col("__g").as("__gb"), blk.as("__blk"))
    a.join(b, "__blk")
      .filter(col("__gb") - col("__ga") >= 1 && col("__gb") - col("__ga") <= w)
      .select(col("id_a"), col("key_a"), col("id_b"), col("key_b"),
        (col("__gb") - col("__ga")).as("gap"))
  }

  /** Monge–Elkan hybrid similarity (Monge & Elkan 1996) over candidate
    * pairs: tokenize both keys, score every token pair with the inner
    * metric (Jaro–Winkler here), take each left token's BEST right match
    * and average — so "Smith John" vs "John A. Smith" scores near 1
    * where whole-string edit distance drowns in the reordering. THE
    * standard second-stage scorer in record linkage, asymmetric by
    * construction; both directions and their mean are emitted.
    *
    * Input `pairs` carries (id_a, key_a, id_b, key_b) — a sorted-
    * neighborhood or banded candidate set, never a product. Per pair
    * the token cross is |a|·|b| (names: a handful); inner JW scores
    * round to 6 dp and max/avg as DECIMAL (the cross-engine rank rule:
    * round BEFORE the argmax, or libm ulps flip which token wins).
    *
    * DISTINCT-token semantics, by design (ADVICE r14): the per-side mean
    * averages over each side's distinct token VALUES (the groupBy on the
    * token collapses duplicates), not the textbook multiset mean — a
    * repeated token contributes its best-match score once, so
    * "john john smith" scores like "john smith". For linkage keys this
    * is the robust choice (token repetition is noise, not evidence); a
    * multiset-mean variant would just weight the explode by its count.
    * Pairs where EITHER key tokenizes to nothing (empty / whitespace-only
    * strings — tokens split on spaces) are kept with null scores rather
    * than dropped — the caller sees every candidate it asked about. */
  def mongeElkan(pairs: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(20, 6)
    // both direction aggregations consume the scored cross — materialize
    // it once (the bigram-stream rule) instead of re-running JW per branch
    val toks = graft.ops.Materialize.stable(
      pairs.select(col("id_a"), col("id_b"),
          explode(TextAnalysis.tokens(col("key_a"))).as("ta"),
          TextAnalysis.tokens(col("key_b")).as("__tbs"))
        .select(col("id_a"), col("id_b"), col("ta"),
          explode(col("__tbs")).as("tb"))
        .withColumn("__jw", round(
          graft.functions.TextExprs.jaroWinkler(col("ta"), col("tb")), 6)
          .cast(dec)),
      "monge-elkan-cross")
    def side(tok: String, out: String): DataFrame = toks
      .groupBy(col("id_a"), col("id_b"), col(tok))
      .agg(max("__jw").as("__best"))
      .groupBy("id_a", "id_b")
      .agg(TextAnalysis.round6Portable(
        sum("__best").cast("double") / count(lit(1))).as(out))
    // left join from the ORIGINAL pair list: a pair whose key tokenizes
    // to nothing never enters the token cross (inner explode) — emit it
    // with null scores instead of silently dropping it (ADVICE r14)
    pairs.select("id_a", "id_b").distinct()
      .join(side("ta", "me_ab"), Seq("id_a", "id_b"), "left")
      .join(side("tb", "me_ba"), Seq("id_a", "id_b"), "left")
      .withColumn("me", TextAnalysis.round6Portable(
        (col("me_ab") + col("me_ba")) / 2))
  }
}
