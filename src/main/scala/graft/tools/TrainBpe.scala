package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** Offline BPE merge trainer (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the train-once tool
  * that produced the frozen merges table in [[graft.rules.Bpe]]. Run:
  *
  *   runMain graft.tools.TrainBpe [sfDir] [nMerges]
  *
  * and paste the printed literal. Deterministic end-to-end: word
  * frequencies aggregate order-independently, the next merge is the
  * max-frequency pair with a lexicographic (x, y) tiebreak, and merge
  * application is the standard left-to-right non-overlapping scan. The
  * merges are FROZEN into the engine (like any production tokenizer's
  * vocab) rather than retrained per query — training collects only the
  * distinct-word frequency table, which is vocabulary-sized, not
  * corpus-sized.
  */
object TrainBpe {

  /** Codepoint symbols (surrogate-safe — Java chars would split astral
    * pairs that the oracle's RE2 `.` keeps whole).
    */
  def codeSyms(word: String): Vector[String] =
    word.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp)))

  private def mergeOnce(syms: Vector[String], x: String,
      y: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
        out += x + y; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train up to nMerges merges; stops early when no pair repeats. */
  def train(freqs: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var vocab = freqs.map { case (w, f) => (codeSyms(w), f) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && merges.length < nMerges) {
      val counts =
        mutable.HashMap.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          counts(((syms(i), syms(i + 1)))) += f; i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.headOption
      best match {
        case Some(((x, y), c)) if c >= 2 =>
          merges += ((x, y))
          vocab = vocab.map { case (s, f) => (mergeOnce(s, x, y), f) }
        case _ => go = false
      }
    }
    merges.toSeq
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(48)
    val spark = Sessions.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val freqs = Tables.load(spark, dir, "documents")
      .select(explode(graft.ops.TextHash.words(col("text"))).as("w"))
      .groupBy("w").count()
      .orderBy("w")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = train(freqs, n)
    println(s"  // trained by graft.tools.TrainBpe on $dir " +
      s"(${freqs.size} distinct words), ${merges.size} merges")
    println("  val Merges: Vector[(String, String)] = Vector(")
    println(merges.map { case (x, y) => s"""("${esc(x)}", "${esc(y)}")""" }
      .grouped(4).map("    " + _.mkString(", ")).mkString(",\n") + ")")
    spark.stop()
  }
}
