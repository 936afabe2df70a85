package graft.rules

/** Frozen byte-pair-encoding tokenizer (Sennrich et al. 2016): a trained
  * merges table plus the standard lowest-rank-first apply loop, shared
  * VERBATIM with the DuckDB oracle (the merges become a VALUES lookup and
  * the loop a recursive CTE — see graft.oracle.SqlText.bpeMergesCte).
  *
  * Apply semantics (identical in both engines, by construction):
  * a word is the space-delimited symbol string " c1 c2 ... cn " over its
  * CODEPOINTS; repeatedly find the lowest-rank merge (x, y) whose pattern
  * " x y " occurs in the string and replace ALL occurrences (one standard
  * left-to-right non-overlapping replace pass — both Java String.replace
  * and DuckDB replace() continue scanning after each replacement, so run
  * stragglers are picked up by the next loop iteration); stop when no
  * merge applies. This is the GPT-2-style merge-by-rank encoder. The
  * token count of a word is its final symbol count.
  *
  * Why frozen: every real token-budget decision (corpus mixing by
  * tokens, sequence packing at 512 tokens) runs on the PRODUCTION
  * tokenizer's counts, and production tokenizers are trained once and
  * shipped as data — retraining per query would change token counts
  * under the consumer's feet. graft.tools.TrainBpe reproduces this table.
  */
object Bpe {

  // trained by graft.tools.TrainBpe on /root/testdata/sf0.01 (31 distinct words), 48 merges
  val Merges: Vector[(String, String)] = Vector(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("r", "ow"),
    ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"),
    ("co", "lu"), ("colu", "m"), ("colum", "n"), ("cu", "st"),
    ("cust", "o"), ("custo", "mer"), ("f", "i"), ("fi", "l"),
    ("fil", "t"), ("filt", "er"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("s", "mall"), ("g", "e"), ("l", "ow"),
    ("mer", "ge"), ("s", "low"), ("c", "t"), ("ct", "or"),
    ("d", "er"), ("e", "ctor"), ("or", "der"), ("v", "ector"))

  private val pats: Array[(String, String)] =
    Merges.map { case (x, y) => (s" $x $y ", s" $x$y ") }.toArray

  /** Per-word token cache — BPE cost tracks the VOCABULARY (Zipf), not
    * the corpus; bounded so crawl-scale open vocabularies cannot grow it
    * unboundedly.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val CacheCap = 1 << 16

  /** Final space-delimited symbol string of one word (the apply loop). */
  def encodeSpaced(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 2 + 2)
    sb.append(' ')
    word.codePoints().forEach { cp =>
      sb.appendCodePoint(cp); sb.append(' ')
    }
    var s = sb.toString
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < pats.length && !changed) {
        val (p, r) = pats(i)
        if (s.contains(p)) { s = s.replace(p, r); changed = true }
        i += 1
      }
    }
    s
  }

  /** Per-word final SYMBOL STRING cache (single-space-delimited, no
    * leading/trailing delimiter) — the sub-word surface
    * [[graft.ops.TextDedup.substringDedupBpe]] windows over. Bounded like
    * the count cache and for the same Zipf reason.
    */
  private val symCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Final symbols of one word as a compact "sym1 sym2 ..." string
    * (split on one space to get the symbol list). Empty word → "".
    */
  def encodeCompact(word: String): String = {
    if (word.isEmpty) return ""
    val hit = symCache.get(word)
    if (hit ne null) return hit
    val s = encodeSpaced(word).trim
    if (symCache.size < CacheCap) symCache.put(word, s)
    s
  }

  /** Token count of one word = symbols in its final encoding. */
  def tokenCount(word: String): Long = {
    if (word.isEmpty) return 0L
    // boxed get: the absent sentinel is null, not 0 — cache correctness
    // must not hinge on 0 being an unrepresentable count
    val hit = cache.get(word)
    if (hit ne null) return hit.longValue
    val s = encodeSpaced(word)
    var n = 0L
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') n += 1; i += 1 }
    n -= 1 // k symbols carry k+1 delimiters
    if (cache.size < CacheCap) cache.put(word, n)
    n
  }

  /** The shared tokenizer's `\s` class exactly (Java regex and RE2 agree
    * on ASCII [ \t\n\x0B\f\r]) — Character.isWhitespace would diverge on
    * Unicode separators.
    */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** BPE token count of a whole text: lowered whitespace words (the
    * shared [[graft.ops.TextHash.words]] tokenizer), summed per word.
    * Called from the codegen'd BpeTokenCount expression — one corpus
    * scan, no explode.
    */
  def tokenCountText(text: String): Long = {
    var n = 0L
    var i = 0
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val len = lower.length
    while (i < len) {
      while (i < len && isWs(lower.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(lower.charAt(i))) i += 1
      if (i > start) n += tokenCount(lower.substring(start, i))
    }
    n
  }
}
