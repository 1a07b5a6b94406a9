package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernel for shingle construction, shared by the interpreted and
  * codegen paths of [[DistinctWordShingles]]. Semantics are identical to the
  * built-in composition
  * `array_distinct(transform(sequence(...), i -> array_join(slice(tokens, i+1, k), " ")))`
  * over `filter(split(text, " "), t -> length(t) > 0)` — verified
  * property-style in TextAnalysisSpec — but in ONE pass with no intermediate
  * arrays. The HOF composition evaluates every lambda on Catalyst's
  * interpreted path (tree-walk + closure per element), which measured ~0.4 ms
  * per ~300-char document; this kernel is ~50x cheaper and keeps the
  * surrounding operators inside whole-stage codegen.
  */
object TextKernels {

  /** The `prefixLen` lexicographically-smallest DISTINCT character q-grams
    * of `text` (all of them when fewer exist) — the Ed-Join prefix set the
    * q-gram fuzzy join keys on. Compiled twin of the HOF chain
    * `slice(array_sort(array_distinct(transform(sequence(1, len-q+1),
    * i -> substring(s, i, q)))), 1, prefixLen)`, which runs interpreted
    * (tree-walk + closure per gram) and dominated the q-gram join's setup
    * cost. Iterates code POINTS to mirror `substring`/`length` semantics on
    * non-ASCII input; in the fuzzy join the input is normalize()d ASCII.
    */
  def prefixQGrams(text: UTF8String, q: Int, prefixLen: Int): ArrayData = {
    if (text == null) return null
    val cps = text.toString.codePoints().toArray
    val m = cps.length - q + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // Sort UTF8Strings, not java.lang.Strings: UTF8 binary order (what the
    // HOF chain's array_sort uses) and UTF-16 code-unit order disagree on
    // supplementary-plane characters.
    val sorted = new java.util.TreeSet[UTF8String]
    var i = 0
    while (i < m) {
      sorted.add(UTF8String.fromString(new String(cps, i, q)))
      i += 1
    }
    val out = new Array[Any](math.min(prefixLen, sorted.size))
    val it = sorted.iterator()
    var p = 0
    while (p < out.length) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** ALL distinct character q-grams in first-occurrence order; a string
    * shorter than q (including empty) contributes ITSELF as its single
    * "gram" so short keys stay indexable — bit-compatible with the HOF
    * chain `when(length < q, array(s)).otherwise(array_distinct(
    * transform(sequence(1, length-q+1), i -> substr(s, i, q))))`, which
    * ran INTERPRETED (a closure per gram per row) and dominated the
    * prescreened-JW corpus pass (round 15). Code POINTS, not UTF-16
    * units: Spark's substr and DuckDB's substr both count code points,
    * so a supplementary-plane char is one gram position in all three
    * formulations. */
  def charGrams(text: UTF8String, q: Int): ArrayData = {
    if (text == null) return null
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < q) return new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    val m = n - q + 1
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i < m) {
      seen.add(UTF8String.fromString(new String(cps, i, q)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (p < out.length) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** The prescreen's TWO-FAMILY feature set in ONE compiled pass
    * (round 17 — VERDICT r16 #1's "second structural gram family"):
    *   - contiguous q-grams prefixed "c:" (same distinct/code-point/
    *     short-string-fallback contract as [[charGrams]]);
    *   - STRIDE-2 skip-grams prefixed "s:": for each start i, the q
    *     code points at i, i+2, …, i+2(q−1) — span 2(q−1)+1; strings
    *     shorter than the span contribute no skip feature (no fallback:
    *     the contiguous family already carries short strings).
    * Skip-grams are built from ALTERNATING characters, so their corpus
    * document frequencies are largely decorrelated from the contiguous
    * family's — on closed vocabularies where every contiguous gram's
    * posting set is budget-deep, the rarest SKIP feature is often
    * shallow enough for a full-posting channel, which is where the
    * measured sf1 recall jump comes from (0.47 → 0.95 at q=2 under the
    * identical water-fill budget; SCALING.md round 17). The family
    * prefixes keep the two df spaces disjoint in one feature column. */
  def prescreenGrams(text: UTF8String, q: Int): ArrayData = {
    if (text == null) return null
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val seen = new java.util.LinkedHashSet[UTF8String]
    if (n < q) seen.add(UTF8String.fromString("c:" + s))
    else {
      var i = 0
      while (i <= n - q) {
        seen.add(UTF8String.fromString("c:" + new String(cps, i, q)))
        i += 1
      }
    }
    val span = 2 * (q - 1) + 1
    if (n >= span) {
      val m = n - span + 1
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder(q + 2)
        sb.append("s:")
        var j = 0
        while (j < q) { sb.appendCodePoint(cps(i + 2 * j)); j += 1 }
        seen.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (p < out.length) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** ALL k-token shingles in positional order (the non-distinct sibling of
    * [[distinctShingles]] — duplicatedSpans needs every window START, so
    * dedup would break run detection). Same tokenization, same space join,
    * same empty-below-k contract. */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return null
    val toks = text.toString.split(" ").filter(_.nonEmpty)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - k + 1
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunks of the whitespace token stream in ONE compiled
    * pass — the fused form of [[graft.ext.Dedup.cdcChunks]]' cut rule: cut
    * BEFORE token position p (1-based, p in [2, n-k+1]) iff the k-gram
    * starting at p h60-hashes to 0 mod `modulus`; chunks are the
    * space-joined token slices between cuts, in document order. Fewer
    * than k+1 tokens → one whole-document chunk; no tokens → empty array
    * (explode then drops the doc, matching the relational formulation's
    * non-empty filter). */
  def cdcChunks(text: UTF8String, k: Int, modulus: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val toks = text.toString.split(" ").filter(_.nonEmpty)
    val n = toks.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    val cuts = new scala.collection.mutable.ArrayBuffer[Int](8)
    var p = 2
    while (p <= n - k + 1) {
      sb.setLength(0)
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(p - 1 + j)); j += 1 }
      md.reset()
      val dig = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars == top 60 bits of the first 8 digest bytes
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h = h >>> 4
      if (h % modulus == 0L) cuts += p
      p += 1
    }
    val out = new Array[Any](cuts.length + 1)
    var c = 0
    var start = 1
    while (c <= cuts.length) {
      val end = if (c < cuts.length) cuts(c) - 1 else n
      sb.setLength(0)
      var t = start
      while (t <= end) { if (t > start) sb.append(' '); sb.append(toks(t - 1)); t += 1 }
      out(c) = UTF8String.fromString(sb.toString)
      if (c < cuts.length) start = cuts(c)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash of the whitespace token stream, ONE pass per document
    * — the map-only kernel behind [[graft.ext.Dedup.simhash]]. Per token
    * OCCURRENCE (tf-weighted voting is algebraically identical to ±1 per
    * occurrence): h = the portable h60 (first 15 md5 hex chars, i.e. the
    * digest's top 60 bits), votes[i] += bit_i ? +1 : -1; signature bit i
    * is set iff votes[i] > 0. Returns null for a document with no tokens
    * (mirrors the aggregation formulation, where such docs produce no
    * rows). Replaces a 60-column vote groupBy — the heaviest shuffle in
    * the near-dup pair chain — with zero shuffle. */
  def simhash60(text: UTF8String): java.lang.Long = {
    if (text == null) return null
    val toks = text.toString.split(" ")
    val votes = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var any = false
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        any = true
        md.reset()
        val dig = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars == top 60 bits of the first 8 digest bytes
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        h = h >>> 4
        var j = 0
        while (j < 60) {
          votes(j) += (((h >>> j) & 1L).toInt * 2) - 1
          j += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var sig = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) sig |= 1L << j; j += 1 }
    java.lang.Long.valueOf(sig)
  }

  /** MinHash-LSH banding constants — the single source of truth shared by
    * the kernel below, [[graft.ext.Dedup]]'s aggregation formulation, and
    * the oracle-SQL generator. All arithmetic stays below 2^62. */
  object Minhash {
    val P: Long = 2147483647L // 2^31 - 1
    val coeffs: Seq[(Long, Long)] = Seq(
      (1103515245L, 12345L), (1234567891L, 987654321L),
      (1664525L, 1013904223L), (22695477L, 1L),
      (134775813L, 1L), (214013L, 2531011L),
      (69069L, 362437L), (1812433253L, 1L),
      (48271L, 11L), (16807L, 7L),
      (1103515489L, 104729L), (999999937L, 65537L),
      (735632791L, 524287L), (65537L, 8191L),
      (92717L, 127L), (741103597L, 887L))
    val bands = 4
    val rowsPerBand = 4
    private[functions] val A: Array[Long] = coeffs.map(_._1).toArray
    private[functions] val B: Array[Long] = coeffs.map(_._2).toArray
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val dig = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((dig(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(dig(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** All four LSH band keys of a document in ONE map-only pass — the
    * fused twin of shingle-explode → h60 % P → 16 parallel min aggregates
    * → per-band md5 ([[graft.ext.Dedup.minhashSignatures]]/`bandKeys`,
    * equivalence property-tested). Per distinct k-token shingle: hm = the
    * h60 (top 60 md5 bits) mod P; sig_i = min (a_i·hm + b_i) mod P; band
    * j's key = md5 of sigs {j, j+4, j+8, j+12} joined by ','. Returns
    * null for a document with fewer than k tokens (no shingles — such
    * docs produce no signature rows in the aggregation formulation). */
  def minhashBandKeys(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return null
    val toks = text.toString.split(" ").filter(_.nonEmpty)
    if (toks.length < k) return null
    val nSig = Minhash.A.length
    val sigs = Array.fill(nSig)(Long.MaxValue)
    val seen = new java.util.HashSet[String](math.max(16, toks.length * 2))
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        md.reset()
        val dig = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        val hm = (h >>> 4) % Minhash.P
        var c = 0
        while (c < nSig) {
          val v = (Minhash.A(c) * hm + Minhash.B(c)) % Minhash.P
          if (v < sigs(c)) sigs(c) = v
          c += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](Minhash.bands)
    var bd = 0
    while (bd < Minhash.bands) {
      sb.setLength(0)
      var r = 0
      while (r < Minhash.rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(sigs(bd + Minhash.bands * r))
        r += 1
      }
      out(bd) = UTF8String.fromString(md5Hex(md, sb.toString))
      bd += 1
    }
    new GenericArrayData(out)
  }

  def distinctShingles(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return null
    val toks = text.toString.split(" ").filter(_.nonEmpty)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.max(16, toks.length * 2))
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  /** Per-thread scratch for the pairwise metric kernels: a broadcast
    * nested-loop fuzzy pass evaluates the kernel tens of millions of
    * times per task, and per-call allocation (codepoint arrays, the DL
    * matrix, a transposition map) made the first cut ~17× slower than
    * Spark's allocation-free levenshtein at sf0.1 (59 s / 74 s for 20M
    * pairs vs ~4 s). Buffers grow to the high-water mark and are reused;
    * the `daStamp` version counter makes the ASCII transposition map
    * O(1) to "clear". */
  private final class MetricScratch {
    var cpA = new Array[Int](64)
    var cpB = new Array[Int](64)
    var mA = new Array[Boolean](64)
    var mB = new Array[Boolean](64)
    var dlRows = new Array[Int](0)
    val daAscii = new Array[Int](128)
    // Long, not Int: the version counter increments once per call on a
    // hot path sized for tens of millions of calls per task — an Int
    // would wrap at 2^32 and a stale stamp slot could equal the current
    // version again, silently returning a row index from a long-past
    // invocation. 2^63 increments are unreachable.
    val daStampArr = new Array[Long](128)
    var daVersion = 0L
  }
  private val scratch = new ThreadLocal[MetricScratch] {
    override def initialValue(): MetricScratch = new MetricScratch
  }
  /** Decode `u`'s code points straight from its UTF-8 bytes into `buf`
    * (caller guarantees `buf.length >= u.numBytes`) and return the code
    * point count. The round-13 form went through `u.toString`, which
    * allocates a String + decoded char[] PER CALL — ~4 heap objects per
    * scored pair, i.e. ~10^8 allocations on a 20M-pair JW product. That
    * was invisible in isolated benches (TLAB-cheap) but made the kernel
    * hypersensitive to suite-level heap pressure (VERDICT r13: q149
    * 4.8s isolated vs 33.7s cohesive — young-gen churn, not arithmetic).
    * Direct byte decode makes the kernel genuinely allocation-free.
    * Assumes valid UTF-8 (parquet/UTF8String contract); a truncated
    * trailing sequence is consumed defensively rather than read OOB. */
  private def fillCps(u: UTF8String, buf: Array[Int]): Int = {
    val nb = u.numBytes()
    var i = 0
    var n = 0
    while (i < nb) {
      val b0 = u.getByte(i)
      val len = UTF8String.numBytesForFirstByte(b0)
      if (i + len > nb) { buf(n) = b0 & 0xff; n += 1; i = nb }
      else {
        buf(n) =
          if (len == 1) b0 & 0xff
          else if (len == 2)
            ((b0 & 0x1f) << 6) | (u.getByte(i + 1) & 0x3f)
          else if (len == 3)
            ((b0 & 0x0f) << 12) | ((u.getByte(i + 1) & 0x3f) << 6) |
              (u.getByte(i + 2) & 0x3f)
          else
            ((b0 & 0x07) << 18) | ((u.getByte(i + 1) & 0x3f) << 12) |
              ((u.getByte(i + 2) & 0x3f) << 6) | (u.getByte(i + 3) & 0x3f)
        n += 1
        i += len
      }
    }
    n
  }

  /** Standard Jaro–Winkler similarity (Winkler 1990) over code points:
    * Jaro with match window max(|a|,|b|)/2 − 1, half-transpositions
    * floored (the integer-division convention DuckDB's
    * `jaro_winkler_similarity` follows — probed: 'abcdef'/'bcadef' =
    * 0.944…, i.e. t = ⌊3/2⌋), then the Winkler prefix bonus (≤ 4 chars,
    * p = 0.1) applied only above the 0.7 boost threshold. Complements
    * the Levenshtein family: edit distance charges transposed PAIRS two
    * edits, Jaro–Winkler forgives them — the right metric for
    * keystroke-swap-heavy name matching. Allocation-free on the hot
    * path (thread-local scratch — see [[MetricScratch]]). */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val sc = scratch.get()
    if (sc.cpA.length < ua.numBytes) sc.cpA = new Array[Int](ua.numBytes)
    if (sc.cpB.length < ub.numBytes) sc.cpB = new Array[Int](ub.numBytes)
    val s = sc.cpA
    val t = sc.cpB
    val la = fillCps(ua, s)
    val lb = fillCps(ub, t)
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    if (sc.mA.length < la) sc.mA = new Array[Boolean](la)
    if (sc.mB.length < lb) sc.mB = new Array[Boolean](lb)
    val sM = sc.mA
    val tM = sc.mB
    java.util.Arrays.fill(sM, 0, la, false)
    java.util.Arrays.fill(tM, 0, lb, false)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && t(j) == s(i)) {
          sM(i) = true; tM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var d = 0
    var k = 0
    i = 0
    while (i < la) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s(i) != t(k)) d += 1
        k += 1
      }
      i += 1
    }
    val trans = d / 2
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - trans).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(la, lb))
    while (p < maxP && s(p) == t(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  /** FULL (unrestricted) Damerau–Levenshtein distance over code points —
    * the Lowrance–Wagner 1975 algorithm, where a transposed pair may be
    * edited again later ('ca' → 'abc' = 2, which the restricted OSA
    * variant prices at 3). This is the variant DuckDB's
    * `damerau_levenshtein` implements (probed: ca/abc = 2), so the
    * oracle can score with DuckDB's own function. A keystroke swap
    * costs 1 where plain Levenshtein charges 2. */
  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Int = {
    if (ua.equals(ub)) return 0
    val sc = scratch.get()
    if (sc.cpA.length < ua.numBytes) sc.cpA = new Array[Int](ua.numBytes)
    if (sc.cpB.length < ub.numBytes) sc.cpB = new Array[Int](ub.numBytes)
    val a = sc.cpA
    val b = sc.cpB
    val la = fillCps(ua, a)
    val lb = fillCps(ub, b)
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // flat (la+2) x (lb+2) matrix in reusable thread-local storage — the
    // Lowrance–Wagner transposition term indexes ARBITRARY earlier rows,
    // so the matrix cannot roll; reuse beats reallocation
    val stride = lb + 2
    val need = (la + 2) * stride
    if (sc.dlRows.length < need) sc.dlRows = new Array[Int](need)
    val d = sc.dlRows
    d(0) = inf
    var i = 0
    while (i <= la) { d((i + 1) * stride + 1) = i; d((i + 1) * stride) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(stride + j + 1) = j; d(j + 1) = inf; j += 1 }
    // last-seen-row map for the transposition term: version-stamped
    // 128-slot array for ASCII codepoints (O(1) reset), HashMap spill
    // for anything wider
    sc.daVersion += 1
    val ver = sc.daVersion
    var wide: java.util.HashMap[Integer, Integer] = null
    def daGet(cp: Int): Int =
      if (cp < 128) { if (sc.daStampArr(cp) == ver) sc.daAscii(cp) else 0 }
      else if (wide == null) 0
      else { val v = wide.get(Integer.valueOf(cp)); if (v == null) 0 else v.intValue() }
    def daPut(cp: Int, row: Int): Unit =
      if (cp < 128) { sc.daAscii(cp) = row; sc.daStampArr(cp) = ver }
      else {
        if (wide == null) { wide = new java.util.HashMap[Integer, Integer]() }
        wide.put(Integer.valueOf(cp), Integer.valueOf(row))
      }
    i = 1
    while (i <= la) {
      var db = 0
      val ai = a(i - 1)
      j = 1
      while (j <= lb) {
        val k = daGet(b(j - 1))
        val l = db
        val cost = if (ai == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i * stride + j) + cost
        val ins = d((i + 1) * stride + j) + 1
        val del = d(i * stride + j + 1) + 1
        val trs = d(k * stride + l) + (i - k - 1) + 1 + (j - l - 1)
        d((i + 1) * stride + j + 1) =
          math.min(math.min(sub, ins), math.min(del, trs))
        j += 1
      }
      daPut(ai, i)
      i += 1
    }
    d((la + 1) * stride + lb + 1)
  }

  /** Unicode NFC (canonical composition) of `text` — the normalization a
    * training-data pipeline applies BEFORE any hash/dedup/fingerprint step,
    * because the same visible string arrives from the web in both composed
    * (U+00E9) and decomposed (`e` + U+0301) forms and every byte-level
    * operator downstream (md5 dedup, minhash shingles, simhash) would
    * otherwise treat them as distinct documents. Pure per-row JDK call
    * (`java.text.Normalizer`), no allocation beyond the output string;
    * the ASCII-only fast path below skips the Normalizer entirely — at
    * corpus scale the overwhelmingly-common all-ASCII document pays one
    * byte scan and zero copies. Cross-engine law: equals DuckDB 1.x
    * `nfc_normalize` (both implement UAX #15). */
  def nfcNormalize(text: UTF8String): UTF8String = {
    if (text == null) return null
    if (isAscii(text)) return text
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Diacritic removal: NFD-decompose, drop COMBINING marks (Unicode
    * category Mn), keep everything else byte-for-byte. Matches DuckDB's
    * `strip_accents` (utf8proc) on all canonically-decomposable letters
    * (é→e, ñ→n, ç→c, ü→u …); letters with no decomposition (ø, æ, ß)
    * pass through unchanged in BOTH engines. Same ASCII fast path as
    * [[nfcNormalize]]. */
  def stripAccents(text: UTF8String): UTF8String = {
    if (text == null) return null
    if (isAscii(text)) return text
    val nfd = java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** One pass over the UTF-8 BYTES: any byte >= 0x80 means non-ASCII.
    * ASCII is closed under NFC and accent-stripping, so both kernels can
    * return the input UTF8String unchanged (no toString, no copy). */
  private def isAscii(text: UTF8String): Boolean = {
    val n = text.numBytes()
    var i = 0
    while (i < n) {
      if ((text.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Smith–Waterman local-alignment score (Smith & Waterman 1981) with
    * linear gap costs — the BEST-scoring pair of substrings under
    * (match, mismatch, gap) scoring, never negative. Where the global
    * Levenshtein family charges a short shared fragment for everything
    * around it, local alignment finds "these two names share the token
    * 'S09FTX' verbatim" — the contamination / near-verbatim-span signal.
    * Classic two-row integer DP over CODE POINTS (DuckDB's substring is
    * code-point addressed, so the oracle fold sees the same alphabet);
    * all-int arithmetic, no allocation beyond the two rows. */
  def smithWaterman(ua: UTF8String, ub: UTF8String,
                    matchScore: Int, mismatchScore: Int, gapScore: Int): Int = {
    val x = ua.toString.codePoints().toArray
    val y = ub.toString.codePoints().toArray
    val m = y.length
    if (x.length == 0 || m == 0) return 0
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var best = 0
    var i = 1
    while (i <= x.length) {
      val ca = x(i - 1)
      var j = 1
      while (j <= m) {
        val diag = prev(j - 1) +
          (if (ca == y(j - 1)) matchScore else mismatchScore)
        val up = prev(j) + gapScore
        val left = cur(j - 1) + gapScore
        var h = if (diag > up) diag else up
        if (left > h) h = left
        if (h < 0) h = 0
        cur(j) = h
        if (h > best) best = h
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    best
  }

  /** Edit distance from `pattern` to its BEST-matching substring of
    * `text` (Sellers 1980 approximate string matching): the top DP row
    * is free (a match may start anywhere) and the answer is the MIN of
    * the last row (it may end anywhere) — "does this name/phrase appear
    * in that text, up to k edits", the primitive behind contamination
    * span checks that exact `contains` can't do. Two-row integer DP. */
  def substringEditDistance(pattern: UTF8String, text: UTF8String): Int = {
    val p = pattern.toString.codePoints().toArray
    val t = text.toString.codePoints().toArray
    val m = t.length
    if (p.length == 0) return 0
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= p.length) {
      val cp = p(i - 1)
      cur(0) = i
      var j = 1
      while (j <= m) {
        val diag = prev(j - 1) + (if (cp == t(j - 1)) 0 else 1)
        val up = prev(j) + 1
        val left = cur(j - 1) + 1
        var d = if (diag < up) diag else up
        if (left < d) d = left
        cur(j) = d
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    var best = prev(0)
    var j = 1
    while (j <= m) { if (prev(j) < best) best = prev(j); j += 1 }
    best
  }

  /** Longest-common-subsequence LENGTH — the order-preserving shared
    * content between two strings (diff's underlying measure; the
    * visual-trace family's F2 walks one specific LCS alignment, this
    * returns its size as a scalar similarity core). Two-row integer
    * DP over code points. */
  def lcsLength(ua: UTF8String, ub: UTF8String): Int = {
    val x = ua.toString.codePoints().toArray
    val y = ub.toString.codePoints().toArray
    val m = y.length
    if (x.length == 0 || m == 0) return 0
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= x.length) {
      val ca = x(i - 1)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (ca == y(j - 1)) prev(j - 1) + 1
          else { val u = prev(j); val l = cur(j - 1); if (u > l) u else l }
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }

  /** Smith–Waterman with AFFINE gaps (Gotoh 1982): opening a gap costs
    * `gapOpen`, extending it only `gapExt` — so one long insertion
    * (a word dropped from a name, a clause spliced into a document)
    * costs little more than a short one, where linear gaps charge per
    * character and shred the alignment around it. The scoring model
    * real local aligners ship. Three-lane two-row integer DP
    * (H = best ending in match, E = in horizontal gap, F = in
    * vertical gap), clamped at zero, best cell anywhere. */
  def smithWatermanAffine(ua: UTF8String, ub: UTF8String,
                          matchScore: Int, mismatchScore: Int,
                          gapOpen: Int, gapExt: Int): Int = {
    val x = ua.toString.codePoints().toArray
    val y = ub.toString.codePoints().toArray
    val m = y.length
    if (x.length == 0 || m == 0) return 0
    val NEG = Int.MinValue / 4
    var hPrev = new Array[Int](m + 1)
    var hCur = new Array[Int](m + 1)
    var fPrev = Array.fill(m + 1)(NEG)
    var fCur = new Array[Int](m + 1)
    var best = 0
    var i = 1
    while (i <= x.length) {
      val ca = x(i - 1)
      var e = NEG
      var j = 1
      while (j <= m) {
        val f0 = hPrev(j) - gapOpen
        val f1 = fPrev(j) - gapExt
        val f = if (f0 > f1) f0 else f1
        fCur(j) = f
        val e0 = hCur(j - 1) - gapOpen
        val e1 = e - gapExt
        e = if (e0 > e1) e0 else e1
        val diag = hPrev(j - 1) +
          (if (ca == y(j - 1)) matchScore else mismatchScore)
        var h = if (diag > e) diag else e
        if (f > h) h = f
        if (h < 0) h = 0
        hCur(j) = h
        if (h > best) best = h
        j += 1
      }
      var t = hPrev; hPrev = hCur; hCur = t
      t = fPrev; fPrev = fCur; fCur = t
      i += 1
    }
    best
  }

  /** Needleman–Wunsch GLOBAL alignment score (Needleman & Wunsch 1970),
    * linear gaps — [[smithWaterman]] without the zero clamp and with
    * gap-priced boundaries, so the WHOLE of both strings must align:
    * end-to-end name equivalence where SW's local score forgives
    * surrounding junk. Same two-row integer DP over code points. */
  def needlemanWunsch(ua: UTF8String, ub: UTF8String,
                      matchScore: Int, mismatchScore: Int,
                      gapScore: Int): Int = {
    val x = ua.toString.codePoints().toArray
    val y = ub.toString.codePoints().toArray
    val m = y.length
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j * gapScore; j += 1 }
    var i = 1
    while (i <= x.length) {
      val ca = x(i - 1)
      cur(0) = i * gapScore
      j = 1
      while (j <= m) {
        val diag = prev(j - 1) +
          (if (ca == y(j - 1)) matchScore else mismatchScore)
        val up = prev(j) + gapScore
        val left = cur(j - 1) + gapScore
        var h = if (diag > up) diag else up
        if (left > h) h = left
        cur(j) = h
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}

/** `distinct_word_shingles(text, k)`: the DISTINCT set of k-token shingles
  * (consecutive whitespace tokens joined by single spaces), first-occurrence
  * order, empty array when the document has fewer than k tokens. */
case class DistinctWordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.distinctShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.distinctShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_shingles(text, k)`: ALL k-token shingles in positional order —
  * the non-distinct sibling of [[DistinctWordShingles]] for positional
  * window operators (duplicated-span detection). */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wordShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `cdc_chunks(text, k, modulus)`: content-defined chunks of the token
  * stream — the one-pass compiled form of the CDC cut rule (see
  * [[TextKernels.cdcChunks]]), making document chunking entirely map-only
  * for both the batch dedup operators and the streaming ingest screen. */
case class CdcChunksExpr(child: Expression, k: Int, modulus: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.cdcChunks(input.asInstanceOf[UTF8String], k, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.cdcChunks($c, $k, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `jaro_winkler(a, b)`: standard Jaro–Winkler similarity in [0, 1] —
  * see [[TextKernels.jaroWinkler]]. A native codegen'd scalar so the
  * fuzzy-join hot path stays inside whole-stage codegen (the same rule
  * that keeps `levenshtein` native). */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `damerau_levenshtein(a, b)`: full (unrestricted) Damerau–Levenshtein
  * distance — see [[TextKernels.damerauLevenshtein]]. Codegen'd for the
  * same hot-path reason as [[JaroWinklerExpr]]. */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextKernels.damerauLevenshtein($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `smith_waterman(a, b)`: integer local-alignment score — see
  * [[TextKernels.smithWaterman]]. Codegen'd for the same candidate-pair
  * hot-path reason as [[JaroWinklerExpr]]; the scoring constants are plan
  * literals, baked into the generated call site. */
case class SmithWatermanExpr(left: Expression, right: Expression,
                             matchScore: Int, mismatchScore: Int,
                             gapScore: Int) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "smith_waterman"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.smithWaterman(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], matchScore, mismatchScore, gapScore)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.smithWaterman($a, $b, " +
        s"$matchScore, $mismatchScore, $gapScore)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `needleman_wunsch(a, b)`: integer global-alignment score — see
  * [[TextKernels.needlemanWunsch]]. Codegen'd like [[SmithWatermanExpr]]. */
case class NeedlemanWunschExpr(left: Expression, right: Expression,
                               matchScore: Int, mismatchScore: Int,
                               gapScore: Int) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "needleman_wunsch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.needlemanWunsch(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], matchScore, mismatchScore, gapScore)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.needlemanWunsch($a, $b, " +
        s"$matchScore, $mismatchScore, $gapScore)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `smith_waterman_affine(a, b)` — see
  * [[TextKernels.smithWatermanAffine]]. Codegen'd like its siblings. */
case class SmithWatermanAffineExpr(left: Expression, right: Expression,
                                   matchScore: Int, mismatchScore: Int,
                                   gapOpen: Int, gapExt: Int)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "smith_waterman_affine"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.smithWatermanAffine(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], matchScore, mismatchScore, gapOpen, gapExt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.smithWatermanAffine($a, $b, " +
        s"$matchScore, $mismatchScore, $gapOpen, $gapExt)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `substring_edit_distance(pattern, text)` — see
  * [[TextKernels.substringEditDistance]]. Codegen'd like its siblings. */
case class SubstringEditDistanceExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "substring_edit_distance"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.substringEditDistance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.substringEditDistance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `lcs_length(a, b)` — see [[TextKernels.lcsLength]]. */
case class LcsLengthExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_length"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.lcsLength(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.lcsLength($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextExprs {
  /** Column API for [[JaroWinklerExpr]]. */
  def jaroWinkler(a: Column, b: Column): Column =
    bridge.column(JaroWinklerExpr(bridge.expression(a), bridge.expression(b)))

  /** Column API for [[SubstringEditDistanceExpr]]. */
  def substringEditDistance(pattern: Column, text: Column): Column =
    bridge.column(SubstringEditDistanceExpr(
      bridge.expression(pattern), bridge.expression(text)))

  /** Column API for [[SmithWatermanAffineExpr]]: +2 match, −1 mismatch,
    * −2 to open a gap, −1 to extend it. */
  def smithWatermanAffine(a: Column, b: Column, matchScore: Int = 2,
                          mismatchScore: Int = -1, gapOpen: Int = 2,
                          gapExt: Int = 1): Column =
    bridge.column(SmithWatermanAffineExpr(bridge.expression(a),
      bridge.expression(b), matchScore, mismatchScore, gapOpen, gapExt))

  /** Column API for [[LcsLengthExpr]]. */
  def lcsLength(a: Column, b: Column): Column =
    bridge.column(LcsLengthExpr(bridge.expression(a), bridge.expression(b)))

  /** Column API for [[NeedlemanWunschExpr]] (same default weights as
    * [[smithWaterman]]; score of identical strings = 2·|s|, floor
    * −gap·(|a|+|b|), so normalizers divide by 2·max(|a|,|b|)). */
  def needlemanWunsch(a: Column, b: Column, matchScore: Int = 2,
                      mismatchScore: Int = -1, gapScore: Int = -1): Column =
    bridge.column(NeedlemanWunschExpr(bridge.expression(a),
      bridge.expression(b), matchScore, mismatchScore, gapScore))

  /** Column API for [[SmithWatermanExpr]]: +2 match, −1 mismatch, −1 gap
    * by default (the classic toy-DNA weights; max score = 2·min(|a|,|b|),
    * which normalizers divide by). */
  def smithWaterman(a: Column, b: Column, matchScore: Int = 2,
                    mismatchScore: Int = -1, gapScore: Int = -1): Column =
    bridge.column(SmithWatermanExpr(bridge.expression(a),
      bridge.expression(b), matchScore, mismatchScore, gapScore))

  /** Column API for [[DamerauLevenshteinExpr]]. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    bridge.column(
      DamerauLevenshteinExpr(bridge.expression(a), bridge.expression(b)))

  /** Column API for [[DistinctWordShingles]]. */
  def distinctShingles(text: Column, k: Int = 3): Column =
    bridge.column(DistinctWordShingles(bridge.expression(text), k))

  /** Column API for [[SimHash60]]. */
  def simhash60(text: Column): Column =
    bridge.column(SimHash60(bridge.expression(text)))

  /** Column API for [[MinhashBandKeysExpr]]. */
  def minhashBandKeys(text: Column, k: Int = 3): Column =
    bridge.column(MinhashBandKeysExpr(bridge.expression(text), k))

  /** Column API for [[WordShingles]]. */
  def wordShingles(text: Column, k: Int = 3): Column =
    bridge.column(WordShingles(bridge.expression(text), k))

  /** Column API for [[PrefixQGrams]]. */
  def prefixQGrams(text: Column, q: Int, prefixLen: Int): Column =
    bridge.column(PrefixQGrams(bridge.expression(text), q, prefixLen))

  /** Column API for [[CharGrams]]. */
  def charGrams(text: Column, q: Int): Column =
    bridge.column(CharGrams(bridge.expression(text), q))

  /** Column API for [[PrescreenGrams]]. */
  def prescreenGrams(text: Column, q: Int): Column =
    bridge.column(PrescreenGrams(bridge.expression(text), q))

  /** Column API for [[WinnowFingerprint]]. */
  def winnow(text: Column, k: Int = 5, w: Int = 4): Column =
    bridge.column(WinnowFingerprint(bridge.expression(text), k, w))

  /** Column API for [[CdcChunksExpr]]. */
  def cdcChunks(text: Column, k: Int = 3, modulus: Int = 8): Column =
    bridge.column(CdcChunksExpr(bridge.expression(text), k, modulus))

  /** Column API for [[NfcNormalizeExpr]]. */
  def nfcNormalize(text: Column): Column =
    bridge.column(NfcNormalizeExpr(bridge.expression(text)))

  /** Column API for [[StripAccentsExpr]]. */
  def stripAccents(text: Column): Column =
    bridge.column(StripAccentsExpr(bridge.expression(text)))
}

/** `nfc_normalize(text)`: Unicode NFC canonical composition — see
  * [[TextKernels.nfcNormalize]]. Codegen'd so a normalize-then-dedup
  * pipeline stays inside whole-stage codegen; the all-ASCII fast path
  * makes it nearly free on typical corpora. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `strip_accents(text)`: diacritic removal (NFD + drop Mn marks) — see
  * [[TextKernels.stripAccents]]. */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash60(text)`: 60-bit SimHash signature of the whitespace token
  * stream; null when the document has no tokens — see
  * [[TextKernels.simhash60]]. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash60(input.asInstanceOf[UTF8String])

  // Kernel may return null (token-less doc) even for a non-null input, so
  // the generated code re-checks after the call instead of using the
  // defineCodeGen null-propagation shortcut.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sig")
      s"""java.lang.Long $tmp = graft.functions.TextKernels.simhash60($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_band_keys(text, k)`: the four LSH band keys (md5 hex) of the
  * document's distinct k-token shingle set; null when the document has
  * fewer than k tokens — see [[TextKernels.minhashBandKeys]]. */
case class MinhashBandKeysExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_band_keys"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashBandKeys(input.asInstanceOf[UTF8String], k)

  // Kernel returns null for sub-k-token docs even on non-null input, so
  // the generated code re-checks after the call.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("bk")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.TextKernels.minhashBandKeys($c, $k);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `prefix_qgrams(text, q, prefixLen)`: the prefixLen smallest distinct
  * character q-grams, sorted — see [[TextKernels.prefixQGrams]]. */
case class PrefixQGrams(child: Expression, q: Int, prefixLen: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "prefix_qgrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.prefixQGrams(input.asInstanceOf[UTF8String], q, prefixLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.prefixQGrams($c, $q, $prefixLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `char_grams(text, q)`: all distinct character q-grams,
  * first-occurrence order; sub-q strings yield themselves — see
  * [[TextKernels.charGrams]]. */
case class CharGrams(child: Expression, q: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.charGrams(input.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.charGrams($c, $q)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `prescreen_grams(text, q)`: the two-family (contiguous + stride-2
  * skip) prescreen feature set — see [[TextKernels.prescreenGrams]].
  * Codegen'd: this runs once per corpus row on the prescreen tiers'
  * hottest pass. */
case class PrescreenGrams(child: Expression, q: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "prescreen_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.prescreenGrams(input.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.prescreenGrams($c, $q)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing constants shared with the oracle-SQL generator. */
object Winnow {
  val B = 257L
  val P = 1000000007L

  /** B^e mod P, for rendering the per-gram polynomial in oracle SQL. */
  def pow(e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = r * B % P; i += 1 }
    r
  }

  /** Document fingerprint by winnowing (Schleimer/Wilkerson/Aiken, SIGMOD
    * 2003): Rabin-Karp rolling hash over lowercase char k-grams (O(1) per
    * slide), then each window of `w` consecutive gram hashes selects its
    * minimum (rightmost on ties); the fingerprint is the sorted distinct
    * selected hash set. Guarantees any shared substring of length >= k+w-1
    * contributes at least one common fingerprint hash. */
  def winnow(text: String, k: Int, w: Int): Array[Long] = {
    // Code POINTS, not UTF-16 code units: the oracle's per-character
    // ascii(substring(s, i, 1)) sees one value per code point, so a
    // supplementary-plane char (emoji) must contribute ONE hash term here
    // too — charAt() would split it into two surrogates (and shift every
    // gram index after it). Lowercasing is per code point
    // (Character.toLowerCase) rather than String.toLowerCase: full-string
    // case mapping can change the code-point COUNT (e.g. U+0130 -> 'i' +
    // U+0307), while DuckDB lower() maps code points 1:1.
    val cps = text.codePoints().map(Character.toLowerCase _).toArray
    val n = cps.length
    if (n < k) return Array.empty[Long]
    val m = n - k + 1
    val hs = new Array[Long](m)
    val topPow = pow(k - 1)
    var h = 0L
    var j = 0
    while (j < k) { h = (h * B + cps(j)) % P; j += 1 }
    hs(0) = h
    var i = 1
    while (i < m) {
      h = ((h - cps(i - 1) * topPow % P + P) % P * B + cps(i + k - 1)) % P
      hs(i) = h
      i += 1
    }
    val numWin = math.max(1, m - w + 1)
    val sel = new java.util.TreeSet[java.lang.Long]
    var p = 0
    while (p < numWin) {
      val hi = math.min(p + w, m)
      var best = p
      var q = p + 1
      while (q < hi) { if (hs(q) <= hs(best)) best = q; q += 1 } // rightmost min
      sel.add(hs(best))
      p += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }
}

/** `winnow_fingerprint(text, k, w)`: sorted distinct winnowing-selected
  * gram hashes as ARRAY<BIGINT>; empty array for texts shorter than k. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(Winnow.winnow(input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Winnow.winnow($c.toString(), $k, $w))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
