package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document text kernels as native codegen expressions (SURVEY.md
  * §D4) — the same preference-order-(b) move as [[Fnv1a64]]/[[VecDot]],
  * applied to the two operators whose higher-order-function
  * formulations dominated the full bench:
  *
  *   - BPE segmentation (C85): the chained `aggregate` fold costs
  *     O(word²) per merge (the accumulator array is copied per
  *     element) and its expression tree deepens per merge, pushing the
  *     stage out of efficient codegen — measured 19 s at sf0.1, ~8% of
  *     the whole 159-query sweep. The kernel is one O(word·merges)
  *     loop.
  *   - Winnowing fingerprints (C71): `transform(sequence(...))` over
  *     all windows materializes O(len·w) structs per doc; the kernel
  *     is the classic O(len) monotonic-deque sliding-window minimum.
  *
  * Both kernels are BIT-IDENTICAL re-implementations of the HOF
  * formulations they replace (same greedy-merge positions, same
  * rightmost-tie robust winnowing, same FNV-1a hashes) — the DuckDB
  * oracles that replay those formulations stay green unchanged, which
  * is the proof of equivalence.
  */

/** Greedy left-to-right non-overlapping BPE merge application: split
  * `word` into code-point symbols + `</w>`, then fold each merge row of
  * `merges` (array<struct<l,r,m: string>>, in array order) through one
  * full pass — exactly [[Keywords.greedyMergeFold]] per row, so "a a a"
  * under (a,a) → ["aa","a"]. */
case class BpeSegment(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
        if s.fields.length == 3 && s.fields.forall(_.dataType == StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_segment requires (string, array<struct<l,r,m: string>>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_segment"

  override protected def nullSafeEval(w: Any, m: Any): Any =
    BpeSegment.compute(w.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, m) => s"graft.functions.BpeSegment.compute($w, $m)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BpeSegment =
    copy(left = newLeft, right = newRight)
}

object BpeSegment {
  private final val EndMark = "</w>"

  /** Static so generated code can call it.
    *
    * Production-vocab cost shape (C153): the loop is O(merges ×
    * |syms|) like the original fold, but allocation-LIGHT so a 32k-50k
    * shipped-tokenizer table is practical — merge symbols compare as
    * UTF8String byte-views (zero decode; the original's 3 String
    * decodes per merge row put ~100k allocations per word at 32k
    * merges), a presence pre-scan skips the rebuild pass for the vast
    * majority of rows that touch nothing, and a fully-merged word
    * (one symbol left — frequent words chain to a single token) exits
    * early. Results are BIT-IDENTICAL to the original (byte equality
    * IS string equality; same greedy pend-pass); output symbols are
    * CLONED because views into the incoming row buffer would alias
    * memory the runtime reuses for the next row. */
  def compute(word: UTF8String, merges: ArrayData): ArrayData = {
    val w = word.toString
    var syms = new java.util.ArrayList[UTF8String](w.length + 1)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val cc = Character.charCount(cp)
      syms.add(UTF8String.fromString(w.substring(i, i + cc)))
      i += cc
    }
    syms.add(UTF8String.fromString(EndMark))
    val n = merges.numElements()
    var k = 0
    while (k < n && syms.size > 1) {
      val row = merges.getStruct(k, 3)
      val a = row.getUTF8String(0)
      val b = row.getUTF8String(1)
      // presence pre-scan: only rebuild when the pair occurs
      var found = false
      var j = 0
      val last = syms.size - 1
      while (!found && j < last) {
        if (a.equals(syms.get(j)) && b.equals(syms.get(j + 1))) found = true
        j += 1
      }
      if (found) {
        val m = row.getUTF8String(2)
        val out = new java.util.ArrayList[UTF8String](syms.size)
        var pend: UTF8String = null
        j = 0
        while (j < syms.size) {
          val x = syms.get(j)
          if (pend != null && pend.equals(a) && x.equals(b)) {
            out.add(m); pend = null
          }
          else if (pend == null) pend = x
          else { out.add(pend); pend = x }
          j += 1
        }
        if (pend != null) out.add(pend)
        syms = out
      }
      k += 1
    }
    val arr = new Array[Any](syms.size)
    var t = 0
    while (t < syms.size) { arr(t) = syms.get(t).clone(); t += 1 }
    new GenericArrayData(arr)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bpe_segment"),
    new ExpressionInfo(classOf[BpeSegment].getName, "graft_bpe_segment"),
    (children: Seq[Expression]) => BpeSegment(children(0), children(1)))
}

/** Robust winnowing fingerprint selection (Schleimer et al. 2003) over
  * an ALREADY-NORMALIZED text: FNV-1a-hash every code-point k-gram,
  * keep the minimum hash of each window of `w` consecutive k-grams
  * (ties → RIGHTMOST position), return the DISTINCT selected
  * (h, p) structs in first-selection order. Positions are 1-based
  * code-point indexes, matching `substr`. Texts shorter than k return
  * an empty array (the caller filters them anyway); texts with fewer
  * than w k-grams winnow over one whole-text window. */
case class WinnowSelect(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow requires (string, int, int), got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("p", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(t: Any, k: Any, w: Any): Any =
    WinnowSelect.compute(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) => s"graft.functions.WinnowSelect.compute($t, $k, $w)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): WinnowSelect =
    copy(first = f, second = s, third = t)
}

object WinnowSelect {
  /** Static so generated code can call it. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    // code-point boundaries: offsets(i) = byte offset of code point i
    val nChars = text.numChars()
    val offsets = new Array[Int](nChars + 1)
    var cp = 0
    var off = 0
    while (off < bytes.length) {
      offsets(cp) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      cp += 1
    }
    offsets(nChars) = bytes.length
    val cnt = nChars - (k - 1)
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    // FNV-1a of each k-gram's byte range, no copies
    val h = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var acc = 0xcbf29ce484222325L
      var b = offsets(i)
      val end = offsets(i + k)
      while (b < end) { acc ^= (bytes(b) & 0xff); acc *= 0x100000001b3L; b += 1 }
      h(i) = acc
      i += 1
    }
    // monotonic deque window minimum; popping on >= makes the surviving
    // front the RIGHTMOST minimal position (robust winnowing)
    val nWin = math.max(cnt - w + 1, 1)
    val deque = new Array[Int](cnt)
    var head = 0
    var tail = 0 // deque[head until tail] are candidate indexes
    val outP = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    val seen = new java.util.HashSet[Long]()
    i = 0
    var j = 0 // next window start (0-based)
    while (i < cnt) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      // window j covers [j, j + w - 1] (clipped to cnt-1); it is
      // complete once i reaches min(j + w - 1, cnt - 1)
      while (j < nWin && i == math.min(j + w - 1, cnt - 1)) {
        while (deque(head) < j) head += 1
        val sel = deque(head)
        // distinct (h, p): position uniquely keys a fingerprint here
        if (seen.add(sel.toLong)) {
          val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
          r.setLong(0, h(sel))
          r.setLong(1, sel + 1L) // 1-based position
          outP += r
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(outP.toArray[Any])
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_winnow"),
    new ExpressionInfo(classOf[WinnowSelect].getName, "graft_winnow"),
    (children: Seq[Expression]) => WinnowSelect(children(0), children(1), children(2)))
}

/** Content-defined chunk boundaries (C121) — the storage-dedup cut
  * rule (Muthitacharoen et al. 2001, LBFS; FastCDC is the modern
  * refinement) applied to a text/blob payload: cut after code-point
  * position i whenever the FNV-1a hash of the trailing `w`-char
  * window satisfies `hash mod div == 0` (div a power of two, so the
  * signed/unsigned residue agrees bit-for-bit with the oracle's
  * unsigned fold), plus a deterministic ANCHORED max-length cut at
  * every absolute position k·maxLen — unlike FastCDC's
  * relative-to-chunk-start max (which makes every cut depend
  * sequentially on the previous one), anchored cuts keep the cut set
  * a pure per-position predicate, so the whole chunking is
  * order-free, SQL-expressible, and identical under any parallel
  * split of the scan. Content cuts dominate: an insertion early in a
  * doc shifts only the chunks up to the next surviving content cut,
  * which is the entire point of CDC dedup.
  *
  * Returns `array<struct<start: long, len: long>>` of 1-based
  * code-point chunk spans covering the text exactly (`substr`
  * coordinates); empty text → empty array, text shorter than `w` →
  * one whole-text chunk.
  */
case class CdcChunks(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (StringType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_chunks requires (string, int, int, int), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString}, ${d.catalogString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("start", LongType, nullable = false),
      StructField("len", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(t: Any, w: Any, d: Any, m: Any): Any =
    CdcChunks.compute(t.asInstanceOf[UTF8String], w.asInstanceOf[Int],
      d.asInstanceOf[Int], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w, d, m) =>
      s"graft.functions.CdcChunks.compute($t, $w, $d, $m)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): CdcChunks =
    copy(first = f, second = s, third = t, fourth = q)
}

object CdcChunks {
  /** Static so generated code can call it. */
  def compute(text: UTF8String, w: Int, div: Int, maxLen: Int): ArrayData = {
    require(w > 0 && maxLen > 0 && div > 0 && (div & (div - 1)) == 0,
      s"graft_cdc_chunks: need w>0, maxLen>0, div a positive power of two; " +
        s"got w=$w div=$div maxLen=$maxLen")
    val bytes = text.getBytes
    val nChars = text.numChars()
    if (nChars == 0) return new GenericArrayData(Array.empty[Any])
    val offsets = new Array[Int](nChars + 1)
    var cp = 0
    var off = 0
    while (off < bytes.length) {
      offsets(cp) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      cp += 1
    }
    offsets(nChars) = bytes.length
    val mask = div - 1
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var start = 1 // 1-based start of the current chunk
    var i = 1     // 1-based code-point position under test
    while (i <= nChars) {
      // content cut: FNV-1a over the trailing w-char window [i-w+1, i]
      var isCut = i == nChars || i % maxLen == 0
      if (!isCut && i >= w) {
        var acc = 0xcbf29ce484222325L
        var b = offsets(i - w)
        val end = offsets(i)
        while (b < end) { acc ^= (bytes(b) & 0xff); acc *= 0x100000001b3L; b += 1 }
        isCut = (acc & mask) == 0
      }
      if (isCut) {
        val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
        r.setLong(0, start.toLong)
        r.setLong(1, (i - start + 1).toLong)
        out += r
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cdc_chunks"),
    new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
    (children: Seq[Expression]) =>
      CdcChunks(children(0), children(1), children(2), children(3)))
}
