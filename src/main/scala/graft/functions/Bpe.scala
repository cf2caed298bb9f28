package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding to token IDS — the terminal operator of an LLM
  * data pipeline (counting pieces is [[graft.ext.TextStats.bpeTokenCount]];
  * training consumes ids). The merge table is PINNED: a fixed, versioned
  * artifact exactly like a production tokenizer's `merges.txt`, compiled
  * into rank lookups once per JVM and shipped to executors inside the
  * expression (task-binary broadcast — no per-row closure work).
  *
  * Algorithm (canonical greedy BPE, as in the original Sennrich et al.
  * formulation and every production tokenizer): words are split to
  * characters, then merges apply in RANK order, each exhausting its
  * occurrences left-to-right. Rank order is equivalent to the
  * repeatedly-take-the-lowest-rank-pair spelling because merging rank r
  * can only create pairs involving its new token, and every merge
  * involving a token is created AFTER that token in BPE training — so
  * no pair of rank < r can appear once rank r is reached.
  *
  * Runs as a native codegen'd expression ([[BpeEncodeExpr]]): one
  * static-call per row inside whole-stage codegen, no UDF, no
  * serialization of the text beyond the scan.
  */
object Bpe {

  /** Unknown-character token id (characters outside the base vocab). */
  final val UnkId = 0

  private val BaseChars = "abcdefghijklmnopqrstuvwxyz"

  /** The pinned merge list, rank order. Token ids: UNK=0, a..z=1..26,
    * merged tokens 27+ in rank order. Frozen — changing it is a
    * vocabulary version bump and breaks the committed expected-ids
    * fixture on purpose.
    */
  val merges: Seq[(String, String)] = Seq(
    ("t", "h"),   // 27 "th"
    ("th", "e"),  // 28 "the"
    ("i", "n"),   // 29 "in"
    ("a", "n"),   // 30 "an"
    ("an", "d"),  // 31 "and"
    ("o", "r"),   // 32 "or"
    ("e", "r"),   // 33 "er"
    ("in", "g"),  // 34 "ing"
    ("s", "t"),   // 35 "st"
    ("a", "t"))   // 36 "at"

  /** token string -> id for the full vocab (base chars + merged). */
  val vocab: Map[String, Int] =
    BaseChars.zipWithIndex.map { case (c, i) => c.toString -> (i + 1) }.toMap ++
      merges.zipWithIndex.map { case ((a, b), i) => (a + b) -> (27 + i) }

  private val mergedToken: Array[String] = merges.map { case (a, b) => a + b }.toArray

  /** Encode one word (no whitespace) to token ids. */
  private def encodeWord(word: String, out: java.util.ArrayList[Int]): Unit = {
    var tokens = new Array[String](word.length)
    var i = 0
    while (i < word.length) { tokens(i) = String.valueOf(word.charAt(i)); i += 1 }
    var n = word.length
    var r = 0
    while (r < mergedToken.length && n > 1) {
      val (a, b) = merges(r)
      val ab = mergedToken(r)
      // one left-to-right pass exhausts rank r (see object doc)
      var read = 0
      var write = 0
      while (read < n) {
        if (read + 1 < n && tokens(read) == a && tokens(read + 1) == b) {
          tokens(write) = ab; read += 2
        } else {
          tokens(write) = tokens(read); read += 1
        }
        write += 1
      }
      n = write
      r += 1
    }
    i = 0
    while (i < n) {
      out.add(vocab.getOrElse(tokens(i), UnkId))
      i += 1
    }
  }

  /** Encode text to token ids: whitespace pre-tokenization (merges never
    * cross word boundaries), then per-word greedy BPE.
    */
  def encode(text: String): Array[Int] = {
    val out = new java.util.ArrayList[Int](text.length / 2 + 4)
    var start = -1
    var i = 0
    while (i <= text.length) {
      val ws = i == text.length || Character.isWhitespace(text.charAt(i))
      if (ws && start >= 0) { encodeWord(text.substring(start, i), out); start = -1 }
      else if (!ws && start < 0) start = i
      i += 1
    }
    val arr = new Array[Int](out.size)
    i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    arr
  }

  /** Codegen entry point: UTF8String in, Catalyst array out. */
  def encodeIds(text: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(encode(text.toString))

  /** text -> array<int> of BPE token ids under the pinned merge table. */
  case class BpeEncodeExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "bpe_encode"

    override def nullSafeEval(input: Any): Any =
      encodeIds(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      // the MIRROR class's static forwarder, not `Bpe$.MODULE$`: with no
      // companion class, Janino rejects the MODULE$ spelling — which made
      // generated code fail to COMPILE and silently fall back to
      // interpreted eval per query (the plan string still shows `*(1)`,
      // so a plan-text assert cannot catch it; BpeSpec now compiles the
      // projection eagerly instead)
      nullSafeCodeGen(ctx, ev,
        t => s"${ev.value} = graft.functions.Bpe.encodeIds($t);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def bpeEncode(text: Column): Column =
    GraftColumnBridge.column(BpeEncodeExpr(GraftColumnBridge.expression(text)))

  // ------------------------------------------------------------ decode

  /** id -> token string, UNK as U+FFFD. Built once per JVM from the
    * same pinned vocab the encoder uses — the two cannot drift.
    */
  private val idToToken: Array[String] = {
    val arr = new Array[String](vocab.values.max + 1)
    arr(UnkId) = "�"
    vocab.foreach { case (tok, id) => arr(id) = tok }
    arr
  }

  /** Decode token ids back to the character stream. Whitespace is NOT
    * recoverable: this mini-tokenizer has no whitespace tokens (unlike
    * a production byte-level BPE, where decode is exact), so the
    * round-trip contract is decode(encode(text)) == text minus
    * whitespace — pinned by `BpeSpec` and the `q_ext_bpe_decode` gate.
    * Unknown ids (outside the vocab) decode as U+FFFD.
    */
  def decode(ids: Array[Int]): String = {
    val sb = new java.lang.StringBuilder(ids.length * 2)
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      sb.append(if (id >= 0 && id < idToToken.length && idToToken(id) != null)
        idToToken(id) else "�")
      i += 1
    }
    sb.toString
  }

  /** Codegen entry point for [[BpeDecodeExpr]]. */
  def decodeIds(ids: ArrayData): UTF8String =
    UTF8String.fromString(decode(ids.toIntArray()))

  /** array<int> of token ids -> decoded string. */
  case class BpeDecodeExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def prettyName: String = "bpe_decode"

    override def nullSafeEval(input: Any): Any =
      decodeIds(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      // mirror-class static forwarder — see BpeEncodeExpr
      nullSafeCodeGen(ctx, ev,
        t => s"${ev.value} = graft.functions.Bpe.decodeIds($t);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def bpeDecode(ids: Column): Column =
    GraftColumnBridge.column(BpeDecodeExpr(GraftColumnBridge.expression(ids)))
}
