package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native text-shingling kernels.
  *
  * The composable forms (`transform(sequence(...), j -> xxhash64(concat(...)))`
  * + `array_distinct`, and nested `transform`/`filter` pair expansion) run
  * interpreted — Spark's higher-order functions sit outside whole-stage
  * codegen and allocate per element. Profiling qd09 at sf0.1 put ~2.5 s of a
  * 4.5 s query in exactly those two spots. These expressions generate a
  * single static call per row instead (builder contract preference (b):
  * custom `Expression` with `doGenCode` before any UDF).
  */
object TextHashes {
  private final val Seed = 42L

  /** Distinct xxhash64 values of the word bigrams of a token array.
    * Each bigram is hashed as hash(hash(tok_i), hash(tok_{i+1})) — tokens
    * are space-split so the pair hash is equivalent to hashing the joined
    * "tok_i tok_j" string: no ambiguity, no concat allocation. */
  def bigramHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - 1)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    var prev = hashTok(arr, 0)
    var m = 0
    var i = 1
    while (i < n) {
      val cur = hashTok(arr, i)
      val h = XXH64.hashLong(cur, prev)
      if (seen.add(h)) { out(m) = h; m += 1 }
      prev = cur
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  private def hashTok(arr: ArrayData, i: Int): Long =
    if (arr.isNullAt(i)) 0L else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)

  /** Distinct chained-xxhash64 values of every `n`-token window of a token
    * array — [[bigramHashes]] generalized to n (for n = 2 the per-window
    * chain is bit-identical to bigramHashes' pair hash). Window hash =
    * fold of the per-token xxhash64 values, so a window never materializes
    * as a string: the composable form
    * `array_distinct(transform(sequence(...), i -> xxhash64(concat_ws(' ', slice(tk, i, n)))))`
    * allocates a slice array + joined string per window inside an
    * interpreted higher-order function; this is O(n) `hashLong` calls per
    * window on L precomputed token hashes. Hash VALUES differ from the
    * concat form — callers must use window hashes only as opaque distinct
    * keys (every in-repo site does: bucket keys and distinct counts).
    *
    * `truncShort` selects the short-document contract the two in-repo
    * shingle families use: `true` = documents shorter than n emit ONE
    * truncated window ([[graft.operators.Text.shingles]] / slice
    * semantics), `false` = they emit nothing (the
    * `when(size(tk) >= n, ...) otherwise empty` sites). */
  def ngramHashes(arr: ArrayData, n: Int, truncShort: Boolean): ArrayData = {
    val L = arr.numElements()
    // an empty array emits no windows under EITHER short-doc contract
    // (truncShort's one truncated window needs at least one token);
    // without this, truncShort=true read th(0) of a zero-length array —
    // unreachable from in-repo sites (split never yields an empty array)
    // but ngram_hashes is registered session-wide (r11 ADVICE)
    if (L == 0 || (L < n && !truncShort))
      return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](L)
    var i = 0
    while (i < L) { th(i) = hashTok(arr, i); i += 1 }
    val nw = if (L < n) 1 else L - n + 1
    val out = new Array[Long](nw)
    val seen = new java.util.HashSet[java.lang.Long](nw * 2)
    var m = 0
    i = 0
    while (i < nw) {
      var acc = th(i)
      var j = i + 1
      val end = math.min(i + n, L)
      while (j < end) { acc = XXH64.hashLong(th(j), acc); j += 1 }
      if (seen.add(acc)) { out(m) = acc; m += 1 }
      i += 1
    }
    if (m == nw) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** All id pairs {a, b} of a bucket, packed (min << 32) | max into one
    * long per pair. Ids must fit in 31 bits (checked). Output length is
    * exactly k(k-1)/2 — callers cap bucket size upstream at scale. */
  def packedPairs(arr: ArrayData): ArrayData = {
    val k = arr.numElements()
    if (k < 2) return new GenericArrayData(Array.emptyLongArray)
    val ids = new Array[Long](k)
    var i = 0
    while (i < k) {
      val v = arr.getLong(i)
      if (v < 0 || v > Int.MaxValue)
        throw new IllegalArgumentException(s"packed_pairs id out of 31-bit range: $v")
      ids(i) = v
      i += 1
    }
    val out = new Array[Long](k * (k - 1) / 2)
    var m = 0
    i = 0
    while (i < k) {
      var j = i + 1
      while (j < k) {
        val a = ids(i); val b = ids(j)
        if (a != b) { out(m) = if (a < b) (a << 32) | b else (b << 32) | a; m += 1 }
        j += 1
      }
      i += 1
    }
    if (m == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 16-bit SimHash of a token multiset: per-token MD5, one bit per hex
    * digit of the first four (= first two digest bytes), majority vote per
    * bit position. Bit b of a token's contribution is
    * `(hexval(hexchar(b div 4)) >> (b % 4)) & 1` — byte-identical to the
    * composable `md5()`/`substring`/`instr` formula the qd08 oracle mirrors
    * (hex char 2j is the high nibble of digest byte j). The composable form
    * runs 16 interpreted string ops per token inside nested higher-order
    * functions; this is one digest + 16 integer ops per token, codegen'd. */
  def simhash16(arr: ArrayData): Long = {
    val md = Md5.get()
    val bal = new Array[Int](16)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(
        if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes)
      // v16 = nib0 | nib1<<4 | nib2<<8 | nib3<<12 where nib_j = hexval of
      // hex char j+1: chars (1,2) are the (high, low) nibbles of byte 0,
      // chars (3,4) of byte 1
      val v16 = ((digest(0) >> 4) & 0xF) | ((digest(0) & 0xF) << 4) |
        (((digest(1) >> 4) & 0xF) << 8) | ((digest(1) & 0xF) << 12)
      var b = 0
      while (b < 16) {
        bal(b) += (if (((v16 >> b) & 1) == 1) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (bal(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Unicode NFC normalization (canonical composition). Spark has no
    * built-in for this — `lower`/`trim` treat "é" (U+00E9) and
    * "é" (e + combining acute) as different strings, so any dedup
    * or token count over multi-source web text splits on encoding
    * accidents. DuckDB's `nfc_normalize` is the oracle-side twin.
    * Fast path: already-normalized text (the overwhelming case — ASCII
    * and most UTF-8 in the wild is NFC) returns the input UTF8String
    * without copying. */
  def nfcNormalize(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Idempotent SQL registration of the kernels (no-op — and no
    * "replaced a previously registered function" warning — when already
    * registered in the session). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("bigram_hashes")))
      reg.createOrReplaceTempFunction(
        "bigram_hashes", exprs => BigramHashes(exprs.head), "built-in")
    if (!reg.functionExists(FunctionIdentifier("packed_pairs")))
      reg.createOrReplaceTempFunction(
        "packed_pairs", exprs => PackedPairs(exprs.head), "built-in")
    if (!reg.functionExists(FunctionIdentifier("ngram_hashes")))
      reg.createOrReplaceTempFunction(
        "ngram_hashes", exprs => NgramHashes(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Boolean]), "built-in")
    if (!reg.functionExists(FunctionIdentifier("simhash16_long")))
      reg.createOrReplaceTempFunction(
        "simhash16_long", exprs => Simhash16(exprs.head), "built-in")
    if (!reg.functionExists(FunctionIdentifier("nfc_normalize")))
      reg.createOrReplaceTempFunction(
        "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
    // Spark ships these two only as internal expressions (the optimizer's
    // runtime row-level filtering uses them); surfacing them makes the
    // broadcast-Bloom pre-filter pattern (Dedup.crossCorpusContaminationBloom)
    // expressible without any custom sketch code.
    if (!reg.functionExists(FunctionIdentifier("bloom_filter_agg")))
      reg.createOrReplaceTempFunction(
        "bloom_filter_agg", exprs =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
            .toAggregateExpression(), "built-in")
    if (!reg.functionExists(FunctionIdentifier("z_interleave")))
      reg.createOrReplaceTempFunction(
        "z_interleave", exprs => ZInterleave(exprs(0), exprs(1), exprs(2)), "built-in")
    if (!reg.functionExists(FunctionIdentifier("pq_encode")))
      reg.createOrReplaceTempFunction(
        "pq_encode", exprs => PqEncode(exprs(0), exprs(1), exprs(2)), "built-in")
    if (!reg.functionExists(FunctionIdentifier("might_contain")))
      reg.createOrReplaceTempFunction(
        "might_contain", exprs =>
          org.apache.spark.sql.catalyst.expressions
            .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }

  /** Column API for `ngram_hashes` (registers on first use, like
    * [[graft.functions.DotProductLong.dot]]): operator call sites used to
    * splice the caller-supplied column name into a SQL string, which broke
    * for names needing backtick quoting (r11 ADVICE). Callers pass the
    * token-array Column built with the Column API (`split(col(c), " ")`). */
  def ngramHashesCol(spark: org.apache.spark.sql.SparkSession,
      tokens: org.apache.spark.sql.Column, n: Int, truncShort: Boolean)
      : org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("ngram_hashes", tokens,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(truncShort))
  }
}

/** `bigram_hashes(array<string>) -> array<bigint>` (distinct). */
case class BigramHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    TextHashes.bigramHashes(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.bigramHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ngram_hashes(array<string>, n, truncShort) -> array<bigint>` distinct
  * chained-xxhash64 window hashes (n and truncShort must be literals). */
case class NgramHashes(child: Expression, n: Int, truncShort: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"ngram_hashes n must be >= 1: $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    TextHashes.ngramHashes(a.asInstanceOf[ArrayData], n, truncShort)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.ngramHashes($c, $n, $truncShort)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash16_long(array<string>) -> bigint` 16-bit SimHash. */
case class Simhash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    TextHashes.simhash16(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash16($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `packed_pairs(array<bigint>) -> array<bigint>` of (lo << 32) | hi codes. */
case class PackedPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    TextHashes.packedPairs(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.packedPairs($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `nfc_normalize(string) -> string` Unicode canonical composition. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected string, got $t")
  }
  override def nullSafeEval(s: Any): Any =
    TextHashes.nfcNormalize(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
