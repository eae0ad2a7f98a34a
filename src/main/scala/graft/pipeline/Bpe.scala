package graft.pipeline

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

/** Real byte-pair-encoding tokenizer over a literal merges table —
  * the exact-token-count engine behind [[TextAnalysis.bpeTokenCount]],
  * sequence packing, chunking and mixture rates (reference surface:
  * token-budget ops in training-data pipelines; geopyspark has no
  * tokenizer, this is the builder-brief text-analysis core).
  *
  * ## Contract (shared verbatim with the DuckDB oracle)
  *
  * 1. Pre-tokenize ASCII-case-folded text (ONLY 'A'..'Z' map to
  *    'a'..'z' — see [[asciiLower]]; non-ASCII letters are never
  *    folded) with the regex `[a-z]+|[0-9]|[^a-z0-9 \t\n\r]` (letter
  *    runs, single digits, single punctuation marks). NULL text is
  *    treated as '' (zero tokens) at the [[TextAnalysis]] surface —
  *    the raw `bpe_count` SQL function stays null-propagating.
  * 2. Represent each pre-token as space-separated symbols with a
  *    leading and trailing space: `"the"` -> `" t h e "`.
  * 3. For each merge rule `(a, b)` in rank order, replace every
  *    leftmost non-overlapping occurrence of `" a b "` with `" ab "`
  *    (plain string replace — NOT regex). This is the training-time
  *    BPE apply: each rule runs once, fully, in priority order.
  * 4. The surviving space-separated symbols are the tokens.
  *
  * Step 3's string-replace semantics are identical in Java
  * (`String.replace`) and DuckDB (`replace`), which is what makes the
  * oracle twin bit-exact: the SQL states the same chain of `replace`
  * calls over the same spaced representation (see [[countSql]] /
  * [[joinedSql]]).
  *
  * ## Scale shape
  *
  * Pure per-row computation — shuffle-free, scan-bound, embedded in
  * whole-stage codegen via the native expressions in
  * `org.apache.spark.sql.graft.BpeCountExpr` / `BpeJoinedExpr` (a
  * static call per row, no UDF serialization). Word->encoding results
  * are memoized per executor in a bounded concurrent cache: corpus
  * vocabulary is Zipf-distributed, so the hit rate is ~1 at any corpus
  * size while the cap bounds executor memory.
  */
object Bpe {

  /** The merges table, in rank (priority) order. A toy English table:
    * common bigrams first, then word-level merges. Several corpus
    * words intentionally stay multi-token (query, column, customer,
    * filter, group, small, vector) so exact counts differ from
    * whitespace counts. */
  val Merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("a", "t"), ("a", "s"), ("s", "t"), ("o", "r"),
    ("a", "r"), ("a", "l"), ("o", "w"), ("l", "e"), ("u", "e"),
    ("c", "h"), ("q", "u"), ("th", "e"), ("an", "d"), ("in", "g"),
    ("t", "a"), ("b", "le"), ("ta", "ble"),
    ("v", "al"), ("val", "ue"),
    ("qu", "er"),
    ("w", "in"), ("d", "ow"), ("win", "dow"),
    ("st", "re"), ("stre", "a"), ("strea", "m"),
    ("s", "p"), ("sp", "ar"), ("spar", "k"),
    ("or", "d"), ("ord", "er"),
    ("s", "or"), ("sor", "t"),
    ("b", "at"), ("bat", "ch"),
    ("f", "as"), ("fas", "t"),
    ("h", "as"), ("has", "h"),
    ("s", "c"), ("sc", "an"),
    ("r", "o"), ("g", "ro"), ("u", "p"),
    ("s", "m"), ("sm", "al"),
    ("s", "l"), ("sl", "ow"),
    ("l", "in"), ("lin", "e"),
    ("m", "er"), ("g", "e"), ("mer", "ge"),
    ("f", "i"), ("fi", "l"), ("t", "er"),
    ("c", "o"), ("co", "l"), ("u", "m"), ("um", "n"),
    ("c", "u"), ("o", "m"), ("om", "er"), ("cu", "st"),
    ("o", "in"), ("j", "oin"),
    ("k", "e"), ("ke", "y"),
    ("p", "ar"), ("par", "t"),
    ("d", "at"), ("dat", "a"),
    ("d", "up"),
    ("b", "i"), ("bi", "g"),
    ("g", "g"), ("a", "gg"),
    ("r", "ow"),
    ("v", "e"), ("ve", "c"), ("t", "or"))

  /** Pre-tokenizer (over case-folded text). ASCII-only classes — same
    * meaning in Java regex (engine) and RE2 (DuckDB oracle). The
    * whitespace is written with `\t`/`\n`/`\r` ESCAPES (both engines
    * accept them inside a character class) so the pattern string
    * contains no literal control characters: this text is embedded in
    * generated oracle SQL that later passes through stripMargin, and a
    * literal newline followed by a future '|' would silently corrupt
    * the SQL. */
  val PreTokenPattern = "[a-z]+|[0-9]|[^a-z0-9 \\t\\n\\r]"

  private[pipeline] val preToken = Pattern.compile(PreTokenPattern)

  /** ASCII-only case fold: maps 'A'..'Z' to 'a'..'z' and NOTHING else.
    * Java's toLowerCase applies full Unicode SpecialCasing (e.g.
    * U+0130 'İ' -> "i" + combining dot, TWO codepoints) while DuckDB's
    * lower() is utf8proc's simple per-codepoint map — the two disagree
    * on non-ASCII input. Restricting the fold to [A-Z] on BOTH sides
    * (the oracle uses translate() with the same 26-letter map) pins
    * the contract exactly: non-ASCII letters are never folded, fall
    * out of the `[a-z]+` class, and tokenize as single marks in both
    * engines. */
  def asciiLower(s: String): String = {
    var i = 0
    while (i < s.length && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == s.length) s
    else {
      val a = s.toCharArray
      while (i < a.length) {
        val c = a(i)
        if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
        i += 1
      }
      new String(a)
    }
  }

  /** DuckDB twin of [[asciiLower]]: translate() is a pinned
    * per-character map in every engine, unlike lower() (utf8proc
    * simple fold) vs Java toLowerCase (full SpecialCasing). */
  private[pipeline] def asciiLowerSql(col: String): String =
    s"translate($col, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"

  /** The default model over the literal [[Merges]] table — all the
    * hot-path entry points below delegate here, so the native
    * expressions' static calls are unchanged by the model refactor. */
  val Default: BpeModel = new BpeModel(Merges)

  def encodeWord(w: String): String     = Default.encodeWord(w)
  def tokensJoined(text: String): String = Default.tokensJoined(text)
  def countTokens(text: String): Long    = Default.countTokens(text)
  def tokens(text: String): Array[String] = Default.tokens(text)
  def joinedSql(col: String): String     = Default.joinedSql(col)
  def countSql(col: String): String      = Default.countSql(col)

  /** Parse a merges file in the public GPT-2 `merges.txt` format: an
    * optional `#version:` header, then one `a b` pair per line in rank
    * order; blank lines and further `#` comment lines are skipped.
    * Pairs are returned verbatim — the apply chain treats them exactly
    * like the literal table. */
  def loadMerges(path: String): Vector[(String, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      src.getLines().zipWithIndex.flatMap { case (line, i) =>
        val t = line.trim
        if (t.isEmpty || t.startsWith("#")) None
        else t.split(" ") match {
          case Array(a, b) if a.nonEmpty && b.nonEmpty => Some((a, b))
          case _ =>
            throw new IllegalArgumentException(
              s"$path:${i + 1}: expected 'a b', got '$line'")
        }
      }.toVector
    } finally src.close()
  }

  /** Model from a GPT-2-format merges file (see [[loadMerges]]). */
  def fromFile(path: String): BpeModel = new BpeModel(loadMerges(path))

  private val UpperAscii = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val LowerAscii = "abcdefghijklmnopqrstuvwxyz"

  /** Word -> leading/trailing-spaced symbol string (`" t h e "`),
    * split on CODEPOINTS like [[BpeModel.encodeWord]] — the oracle's
    * `regexp_extract_all(w, '(.)')` also yields codepoints, so the
    * two sides agree beyond ASCII (UTF-16 units would not). */
  private def codepointSpaced(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      sb.appendCodePoint(cp).append(' ')
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** UTF-8 binary order — DuckDB's default collation, which the
    * trainSql tie-break sorts with. JVM String ordering compares
    * UTF-16 units and disagrees above the BMP (a 4-byte codepoint
    * sorts BEFORE U+E000.. in UTF-16 but AFTER in UTF-8). */
  private def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def adjacentPairs(sp: String): Array[(String, String)] = {
    val syms = sp.trim.split(' ')
    if (syms.length < 2) Array.empty
    else Array.tabulate(syms.length - 1)(i => (syms(i), syms(i + 1)))
  }

  /** Train `numMerges` BPE merge rules on a document corpus — the
    * trainer half of the tokenizer (Sennrich et al. 2016 greedy BPE;
    * [[BpeModel]] is the apply half, and a trained table feeds
    * straight into it).
    *
    * ## Contract (stated identically by [[trainSql]] for the oracle)
    *
    * 1. Vocabulary: pre-tokens of ASCII-case-folded text (same
    *    pre-tokenizer as apply) -> (word, count).
    * 2. Each word as leading/trailing-spaced codepoint symbols
    *    (`" t h e "`).
    * 3. Per round: count EVERY adjacent symbol pair (overlapping
    *    included) weighted by word count; the winner is the highest
    *    count, ties broken by (a ASC, b ASC) in UTF-8 binary order
    *    (DuckDB's collation); apply the winning merge to the whole
    *    vocabulary with the same single-pass `String.replace`
    *    semantics as encoding. Stop early if no pairs remain.
    *
    * ## Scale shape
    *
    * The corpus-scale work is ONE distributed explode + groupBy(word)
    * (map-side partial counts); the greedy loop then runs driver-side
    * over the AGGREGATED vocabulary, which is Zipf-bounded (millions
    * of distinct words for a 100 TB corpus, guarded by `maxVocab`).
    * Pair counts are maintained INCREMENTALLY: an inverted pair ->
    * word-set index means each merge touches only the words that
    * contain the winning pair (subword-nmt's shape), so a
    * GPT-2-scale 50k-merge train costs O(touched words), not
    * O(numMerges x vocab) full rescans. */
  def train(docs: org.apache.spark.sql.DataFrame, numMerges: Int,
            textCol: String = "text", maxVocab: Int = 1 << 22): Vector[(String, String)] = {
    import org.apache.spark.sql.functions._
    import scala.collection.mutable
    require(numMerges >= 1, "numMerges must be >= 1")
    val vocabDf = docs
      .select(explode(regexp_extract_all(
        translate(coalesce(col(textCol), lit("")), UpperAscii, LowerAscii),
        lit(PreTokenPattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // one corpus scan: counted for the guard, then collected
    val n = vocabDf.count()
    require(n <= maxVocab,
      s"Bpe.train: $n distinct words exceed maxVocab=$maxVocab — raise the guard or pre-filter")
    val vocab = vocabDf.collect()
      .map(r => (codepointSpaced(r.getString(0)), r.getLong(1)))
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addWord(i: Int, sp: String, c: Long): Unit =
      adjacentPairs(sp).foreach { k =>
        counts(k) = counts.getOrElse(k, 0L) + c
        where.getOrElseUpdate(k, mutable.BitSet.empty) += i
      }
    def dropWord(i: Int, sp: String, c: Long): Unit =
      adjacentPairs(sp).foreach { k =>
        val left = counts(k) - c
        if (left == 0L) { counts.remove(k); where.remove(k) }
        else { counts(k) = left; where(k) -= i }
      }
    vocab.zipWithIndex.foreach { case ((sp, c), i) => addWord(i, sp, c) }
    val out = Vector.newBuilder[(String, String)]
    var round = 0
    while (round < numMerges && counts.nonEmpty) {
      var best: (String, String) = null
      var bestC = Long.MinValue
      counts.foreach { case (k, c) =>
        if (c > bestC || (c == bestC && {
          val ca = utf8Compare(k._1, best._1)
          ca < 0 || (ca == 0 && utf8Compare(k._2, best._2) < 0)
        })) { best = k; bestC = c }
      }
      out += best
      val (from, to) = (s" ${best._1} ${best._2} ", s" ${best._1}${best._2} ")
      // only words holding the winning pair change; their old pair
      // multiset retires and the post-replace one takes its place —
      // bitwise identical to a full recount, at O(touched) cost
      where(best).toArray.foreach { i =>
        val (sp, c) = vocab(i)
        val nsp = sp.replace(from, to)
        if (nsp != sp) {
          dropWord(i, sp, c)
          addWord(i, nsp, c)
          vocab(i) = (nsp, c)
        }
      }
      round += 1
    }
    out.result()
  }

  /** DuckDB twin of [[train]]: `numMerges` unrolled greedy rounds over
    * the same vocabulary/pair/tie-break/replace contract, emitting
    * (rank, a, b). MATERIALIZED CTEs keep each round's vocabulary from
    * inlining twice (pair counting + the next round both read it). */
  def trainSql(numMerges: Int, table: String = "documents",
               textCol: String = "text"): String = {
    val pairs = (r: Int) =>
      s"""p$r AS (
         |  SELECT pr.a AS a, pr.b AS b, sum(cnt) AS c
         |  FROM (SELECT unnest(list_transform(range(len(syms) - 1),
         |          i -> struct_pack(a := syms[i + 1], b := syms[i + 2]))) AS pr, cnt
         |        FROM (SELECT string_split(trim(sp), ' ') AS syms, cnt FROM v$r))
         |  GROUP BY 1, 2),
         |b${r + 1} AS (SELECT a, b FROM p$r ORDER BY c DESC, a, b LIMIT 1),
         |v${r + 1} AS MATERIALIZED (
         |  SELECT replace(sp, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS sp, cnt
         |  FROM v$r CROSS JOIN b${r + 1})""".stripMargin
    val v0 =
      s"""v0 AS MATERIALIZED (
         |  SELECT ' ' || array_to_string(regexp_extract_all(w, '(.)'), ' ') || ' ' AS sp,
         |         count(*) AS cnt
         |  FROM (SELECT unnest(regexp_extract_all(
         |          translate(coalesce($textCol, ''), '$UpperAscii', '$LowerAscii'),
         |          '$PreTokenPattern')) AS w FROM $table)
         |  GROUP BY 1)""".stripMargin
    val rounds = (0 until numMerges).map(pairs).mkString(",\n")
    val sel = (1 to numMerges)
      .map(r => s"SELECT CAST($r AS INT) AS rank, a, b FROM b$r")
      .mkString("\nUNION ALL ")
    s"WITH $v0,\n$rounds\n$sel"
  }
}

/** A BPE tokenizer over one merges table. The literal-table singleton
  * is [[Bpe.Default]]; [[Bpe.fromFile]] builds one from a public
  * GPT-2-format merges file. Each model owns its word cache, so
  * distinct vocabularies never cross-contaminate. */
final class BpeModel(val merges: Vector[(String, String)]) extends Serializable {
  import Bpe.{preToken, asciiLower, asciiLowerSql, PreTokenPattern}

  // (find " a b ", emit " ab ") pairs, precomputed once
  private val rules: Array[(String, String)] =
    merges.iterator.map { case (a, b) => (s" $a $b ", s" $a$b ") }.toArray

  // word -> space-joined tokens; bounded (Zipf vocab => ~1 hit rate,
  // cap => no executor OOM on adversarial corpora)
  private val MaxCache = 1 << 17
  @transient private lazy val cache = new ConcurrentHashMap[String, String]()

  /** Encode one pre-token; returns its tokens joined by single
    * spaces. Splits into CODEPOINTS (not UTF-16 units) to match the
    * oracle's RE2 `(.)` semantics on non-BMP input. */
  def encodeWord(w: String): String = {
    val hit = cache.get(w)
    if (hit != null) return hit
    val sb = new java.lang.StringBuilder(w.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      sb.appendCodePoint(cp).append(' ')
      i += Character.charCount(cp)
    }
    var s = sb.toString
    var r = 0
    while (r < rules.length) {
      val (from, to) = rules(r)
      if (s.contains(from)) s = s.replace(from, to)
      r += 1
    }
    val out = s.trim
    if (cache.size < MaxCache) cache.put(w, out)
    out
  }

  /** All tokens of a document, space-joined ("" for empty input). */
  def tokensJoined(text: String): String = {
    val m = preToken.matcher(asciiLower(text))
    val sb = new java.lang.StringBuilder()
    while (m.find()) {
      if (sb.length > 0) sb.append(' ')
      sb.append(encodeWord(m.group()))
    }
    sb.toString
  }

  /** Exact token count of a document. */
  def countTokens(text: String): Long = {
    val m = preToken.matcher(asciiLower(text))
    var n = 0L
    while (m.find()) {
      val enc = encodeWord(m.group())
      // tokens joined by single spaces: count = spaces + 1
      var i = 0
      var c = 1L
      while (i < enc.length) { if (enc.charAt(i) == ' ') c += 1; i += 1 }
      n += c
    }
    n
  }

  def tokens(text: String): Array[String] = {
    val j = tokensJoined(text)
    if (j.isEmpty) Array.empty else j.split(" ")
  }

  // ---------------------------------------------------------------
  // DuckDB oracle twins: the same contract stated as SQL. The chain
  // of replace() calls is generated from the same merges table the
  // engine runs, so the two can never drift.
  // ---------------------------------------------------------------

  /** SQL for one pre-token `w` -> its tokens space-joined. */
  private def wordChainSql: String = {
    var e = """' ' || regexp_replace(w, '(.)', '\1 ', 'g')"""
    merges.foreach { case (a, b) =>
      e = s"replace($e, ' $a $b ', ' $a$b ')"
    }
    s"trim($e)"
  }

  /** DuckDB expression: space-joined BPE tokens of `col` (VARCHAR,
    * '' for empty OR NULL input — COALESCE because
    * array_to_string([]) is NULL; the engine side matches by feeding
    * coalesce(text, '') into BpeJoinedExpr). */
  def joinedSql(col: String): String =
    s"""coalesce(array_to_string(list_transform(regexp_extract_all(${asciiLowerSql(col)}, '$PreTokenPattern'), w -> $wordChainSql), ' '), '')"""

  /** DuckDB expression: exact BPE token count of `col` (BIGINT, 0 for
    * empty or NULL input — matched engine-side by coalesce(text,'')). */
  def countSql(col: String): String =
    s"""CAST(coalesce(list_sum(list_transform(regexp_extract_all(${asciiLowerSql(col)}, '$PreTokenPattern'), w -> len(string_split($wordChainSql, ' ')))), 0) AS BIGINT)"""
}
