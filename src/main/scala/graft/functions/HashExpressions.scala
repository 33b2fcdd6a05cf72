package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic, engine-independent hashing primitives for dedup:
  * FNV-1a 64-bit (self-contained, no dependence on Spark's seeded hashes so
  * results are stable across versions), MinHash signatures, SimHash-64, and
  * a polynomial rolling-hash document fingerprint.
  *
  * These power the dedup operators (exact / MinHash-LSH / SimHash), the
  * Spark-scale equivalents of content-dedup the reference leaves to its
  * vector stores; the hashing-trick itself mirrors the reference's
  * feature-hashing embedder (reference:
  * docarray/document/mixins/featurehash.py:14-54, md5-based sign/value).
  */
object Fnv64 {
  val OFFSET: Long = 0xcbf29ce484222325L
  val PRIME: Long = 0x100000001b3L

  def hashBytes(bytes: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    var h = OFFSET ^ seed
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= PRIME; i += 1 }
    h
  }

  def hashString(s: UTF8String, seed: Long = 0L): Long = {
    val b = s.getBytes
    hashBytes(b, 0, b.length, seed)
  }

  /** splitmix64 finalizer — decorrelates the per-hash-function streams. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

/** fnv64(str[, seed]) → long. Full `doGenCode` (r8): the byte fold
  * inlines into whole-stage codegen. */
case class Fnv64Hash(child: Expression, seed: Long = 0L)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fnv64 expects string, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    Fnv64.hashString(v.asInstanceOf[UTF8String], seed)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b"); val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""byte[] $b = $c.getBytes();
         |long $h = ${Fnv64.OFFSET}L ^ ${seed}L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h ^= ($b[$i] & 0xffL); $h *= ${Fnv64.PRIME}L;
         |}
         |${ev.value} = $h;""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "fnv64"
}

/** splitmix64(key + seed) → long: an engine-portable deterministic rank
  * over an integral key (sampling/shuffling order). Java wrapping
  * arithmetic here; the DuckDB oracle replicates the same finalizer with
  * HUGEINT mod-2^64 stages (see SparkEntry's q52 oracle). */
case class Splitmix64Rank(child: Expression, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"splitmix64_rank expects integral, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any = {
    val x = v match {
      case l: Long => l; case i: Int => i.toLong
      case s: Short => s.toLong; case b: Byte => b.toLong
    }
    Fnv64.mix(x + seed)
  }
  // full doGenCode (r8): the splitmix finalizer is three mult/xor/shift
  // steps — pure inline arithmetic in whole-stage codegen
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val x = ctx.freshName("x")
      s"""long $x = ((long) $c) + ${seed}L + 0x9e3779b97f4a7c15L;
         |$x = ($x ^ ($x >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$x = ($x ^ ($x >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $x ^ ($x >>> 31);""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "splitmix64_rank"
}

/** minhash_signature(tokens, numHashes, seed) → array<long>.
  * h_i(x) = mix(fnv(x) ^ mix(seed + i)); signature[i] = min over tokens.
  * Empty token set → signature of Long.MaxValue (never collides). */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects array<string>, got ${t.sql}")
  }
  @transient private lazy val streams: Array[Long] =
    Array.tabulate(numHashes)(i => Fnv64.mix(seed + i))

  override def nullSafeEval(v: Any): Any =
    HashKernels.minhashSignature(v.asInstanceOf[ArrayData], numHashes,
      streams)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val streamsRef = ctx.addReferenceObj("mhsStreams", streams, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.minhashSignature(" +
        s"$c, $numHashes, $streamsRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** JIT-compiled static kernels behind the codegen'd hash expressions —
  * a top-level object so the mirror class exposes true Java statics the
  * generated code can call directly ([[MinHashText]] / [[SimHash64]]
  * `doGenCode` emit one static call each; the expressions stay inside
  * whole-stage codegen with no [[CodegenFallback]] row materialization
  * or boxing on the >1M-row dedup paths). */
object HashKernels {
  /** The fused tokenize→shingle→minhash walk of [[MinHashText]]. */
  def minhashText(str: UTF8String, ngram: Int, numHashes: Int,
      streams: Array[Long]): ArrayData = {
    val bytes = str.getBytes
    val sig = Array.fill(numHashes)(Long.MaxValue)
    // token boundaries over lowercased alnum bytes
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    val low = new Array[Byte](bytes.length)
    var i = 0
    var inTok = false
    while (i < bytes.length) {
      val b = bytes(i)
      val c: Byte =
        if (b >= 'A' && b <= 'Z') (b + 32).toByte
        else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) b
        else 0
      low(i) = c
      if (c != 0 && !inTok) { starts += i; inTok = true }
      if (c == 0 && inTok) { ends += i; inTok = false }
      i += 1
    }
    if (inTok) ends += bytes.length
    val nTok = starts.length
    var t = 0
    while (t <= nTok - ngram) {
      // FNV over "tok_t tok_{t+1} ... tok_{t+n-1}" joined by 0x20
      var h = Fnv64.OFFSET
      var g = 0
      while (g < ngram) {
        if (g > 0) { h ^= 0x20L; h *= Fnv64.PRIME }
        var p = starts(t + g)
        val e = ends(t + g)
        while (p < e) { h ^= (low(p) & 0xffL); h *= Fnv64.PRIME; p += 1 }
        g += 1
      }
      var k = 0
      while (k < numHashes) {
        val m = Fnv64.mix(h ^ streams(k))
        if (m < sig(k)) sig(k) = m
        k += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  /** The per-token minhash fold of [[MinHashSignature]]. */
  def minhashSignature(arr: ArrayData, numHashes: Int,
      streams: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val base = Fnv64.hashString(arr.getUTF8String(t))
        var i = 0
        while (i < numHashes) {
          val h = Fnv64.mix(base ^ streams(i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  /** The hashing-trick accumulate of [[FeatureHash]]. */
  def featureHash(arr: ArrayData, nDim: Int): ArrayData = {
    val out = new Array[Float](nDim)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = Fnv64.hashString(arr.getUTF8String(t))
        val idx = (((h % nDim) + nDim) % nDim).toInt
        val sign = if ((Fnv64.mix(h) & 1L) == 1L) 1.0f else -1.0f
        out(idx) += sign
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** The min-of-rolling-hashes walk of [[RollingFingerprint]]. */
  def rollingFingerprint(str: UTF8String, window: Int, b: Long,
      bPow: Long): Long = {
    val bytes = str.getBytes
    val n = bytes.length
    if (n == 0) 0L
    else if (n <= window) Fnv64.hashBytes(bytes, 0, n, 0L)
    else {
      var h = 0L
      var i = 0
      while (i < window) { h = h * b + (bytes(i) & 0xffL); i += 1 }
      var best = Fnv64.mix(h)
      while (i < n) {
        h = (h - (bytes(i - window) & 0xffL) * bPow) * b + (bytes(i) & 0xffL)
        val m = Fnv64.mix(h)
        if (m < best) best = m
        i += 1
      }
      best
    }
  }

  /** The boundary walk of [[CdcChunks]]. */
  def cdcChunks(str: UTF8String, window: Int, mask: Long, minLen: Int,
      maxLen: Int, b: Long, bPow: Long): ArrayData = {
    val s = str.toString
    val n = s.length
    if (n == 0) return org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array.empty[UTF8String])
    val cuts = scala.collection.mutable.ArrayBuffer[Int](0)
    var h = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i) & 0xffffL
      h = if (i < window) h * b + c
        else (h - (s.charAt(i - window) & 0xffffL) * bPow) * b + c
      val pos = i + 1 // chars before a cut placed after position i
      // never cut between the halves of a surrogate pair: an astral char
      // split in two mangles both neighboring chunks to '?' on UTF-8
      // encode and breaks the tiling invariant
      if (pos < n && pos - cuts.last >= math.max(minLen, 1) &&
          !Character.isHighSurrogate(s.charAt(i))) {
        if (i >= window - 1 && (Fnv64.mix(h) & mask) == 0L) cuts += pos
        else if (maxLen > 0 && pos - cuts.last >= maxLen) cuts += pos
      }
      i += 1
    }
    cuts += n
    val out = new Array[UTF8String](cuts.length - 1)
    var k = 0
    while (k < cuts.length - 1) {
      out(k) = UTF8String.fromString(s.substring(cuts(k), cuts(k + 1)))
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** The plane-dot sign pack of [[CosineLsh]]. */
  def cosineLsh(a: ArrayData, dim: Int, nPlanes: Int,
      planes: Array[Double], isFloat: Boolean): Long = {
    val n = math.min(dim, a.numElements())
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val base = p * dim
      var dot = 0.0
      var i = 0
      if (isFloat) while (i < n) { dot += a.getFloat(i) * planes(base + i); i += 1 }
      else while (i < n) { dot += a.getDouble(i) * planes(base + i); i += 1 }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** The one-pass shingle assembly of [[TextNgrams]]. */
  def textNgrams(str: UTF8String, ngram: Int): ArrayData = {
    val bytes = str.getBytes
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    val low = new Array[Byte](bytes.length)
    var i = 0
    var inTok = false
    while (i < bytes.length) {
      val b = bytes(i)
      val c: Byte =
        if (b >= 'A' && b <= 'Z') (b + 32).toByte
        else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) b
        else 0
      low(i) = c
      if (c != 0 && !inTok) { starts += i; inTok = true }
      if (c == 0 && inTok) { ends += i; inTok = false }
      i += 1
    }
    if (inTok) ends += bytes.length
    val nTok = starts.length
    val out = new Array[Any](math.max(nTok - ngram + 1, 0))
    var t = 0
    while (t <= nTok - ngram) {
      var len = ngram - 1
      var g = 0
      while (g < ngram) { len += ends(t + g) - starts(t + g); g += 1 }
      val buf = new Array[Byte](len)
      var p = 0
      g = 0
      while (g < ngram) {
        if (g > 0) { buf(p) = ' '; p += 1 }
        val s = starts(t + g); val e = ends(t + g)
        System.arraycopy(low, s, buf, p, e - s)
        p += e - s
        g += 1
      }
      out(t) = UTF8String.fromBytes(buf)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** The fused token-statistics pass of [[TokenTopStats]]. */
  def tokenTopStats(str: UTF8String): InternalRow = {
    val bytes = str.getBytes
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    val low = new Array[Byte](bytes.length)
    var i = 0
    var inTok = false
    while (i < bytes.length) {
      val b = bytes(i)
      val c: Byte =
        if (b >= 'A' && b <= 'Z') (b + 32).toByte
        else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) b
        else 0
      low(i) = c
      if (c != 0 && !inTok) { starts += i; inTok = true }
      if (c == 0 && inTok) { ends += i; inTok = false }
      i += 1
    }
    if (inTok) ends += bytes.length
    val nTok = starts.length
    var sumLen = 0L
    var maxWord = 0
    val counts = new java.util.HashMap[String, Integer]()
    val toks = new Array[String](nTok)
    var t = 0
    while (t < nTok) {
      // tokens are pure lowercase ASCII alnum, so byte length == char
      // length and ISO-8859-1 decoding is exact
      val s = new String(low, starts(t), ends(t) - starts(t),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      toks(t) = s
      sumLen += s.length
      val c = counts.merge(s, Integer.valueOf(1),
        (a: Integer, b2: Integer) => Integer.valueOf(a + b2))
      if (c > maxWord) maxWord = c
      t += 1
    }
    val nBigrams = math.max(nTok - 1, 0)
    var maxBigram = 0
    if (nBigrams > 0) {
      val bc = new java.util.HashMap[String, Integer]()
      var j = 0
      while (j < nTok - 1) {
        val c = bc.merge(toks(j) + " " + toks(j + 1), Integer.valueOf(1),
          (a: Integer, b2: Integer) => Integer.valueOf(a + b2))
        if (c > maxBigram) maxBigram = c
        j += 1
      }
    }
    InternalRow(nTok, counts.size, sumLen, maxWord, nBigrams, maxBigram)
  }

  /** The fused LSH band-hash pass of [[BandHashes]] — Spark's own XXH64
    * fold, replayed element-wise. */
  def bandHashes(sig: ArrayData, bands: Int, rows: Int,
      seed: Long): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = sig.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashLong(seed, 42L)
      h = XXH64.hashInt(b, h)
      var k = b * rows
      val end = math.min(k + rows, n)
      while (k < end) {
        // null elements skip, exactly as xxhash64 over an array child
        if (!sig.isNullAt(k)) h = XXH64.hashLong(sig.getLong(k), h)
        k += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** The fused line/word-rule pass of [[GopherAuxStats]]. */
  def gopherAuxStats(str: UTF8String,
      stop: java.util.HashSet[String]): InternalRow = {
    val s = str.toString
    val L = s.length
    // --- line rules: non-empty '\n' segments; trim/rtrim = ASCII space
    var nLines = 0
    var nBullet = 0
    var nEllipsis = 0
    val lineSet = new java.util.HashSet[String]()
    var start = 0
    var i = 0
    while (i <= L) {
      if (i == L || s.charAt(i) == '\n') {
        if (i > start) {
          val line = s.substring(start, i)
          nLines += 1
          lineSet.add(line)
          var a = 0
          var b = line.length
          while (a < b && line.charAt(a) == ' ') a += 1
          if (a < b) {
            val c0 = line.charAt(a)
            if (c0 == '-' || c0 == '*' || c0 == '•') nBullet += 1
          }
          while (b > a && line.charAt(b - 1) == ' ') b -= 1
          if (b > a && (line.charAt(b - 1) == '…' ||
              (b - a >= 3 && line.charAt(b - 1) == '.' &&
                line.charAt(b - 2) == '.' && line.charAt(b - 3) == '.')))
            nEllipsis += 1
        }
        start = i + 1
      }
      i += 1
    }
    // --- symbol marks (#, …) over the whole text, char-counted
    var nSym = 0
    i = 0
    while (i < L) {
      val c = s.charAt(i)
      if (c == '#' || c == '…') nSym += 1
      i += 1
    }
    // --- token walk: lowercase alnum runs (the [[TokenTopStats]] /
    // minhash_text tokenizer at char level — non-ASCII = separator)
    var nAlpha = 0
    val seenStops = new java.util.HashSet[String]()
    var tStart = -1
    var hasAlpha = false
    i = 0
    while (i <= L) {
      val c = if (i < L) s.charAt(i) else ' '
      val lc: Char =
        if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) c
        else ' '
      if (lc != ' ') {
        if (tStart < 0) { tStart = i; hasAlpha = false }
        if (lc >= 'a' && lc <= 'z') hasAlpha = true
      } else if (tStart >= 0) {
        if (hasAlpha) nAlpha += 1
        if (!stop.isEmpty) {
          val n = i - tStart
          val buf = new Array[Char](n)
          var j = 0
          while (j < n) {
            val cc = s.charAt(tStart + j)
            buf(j) = if (cc >= 'A' && cc <= 'Z') (cc + 32).toChar else cc
            j += 1
          }
          val tok = new String(buf)
          if (stop.contains(tok)) seenStops.add(tok)
        }
        tStart = -1
      }
      i += 1
    }
    InternalRow(nLines, lineSet.size, nBullet, nEllipsis, nAlpha,
      seenStops.size, nSym)
  }

  /** The normalized char-gram pass of [[CharNgrams]]. */
  def charNgrams(str: UTF8String, ngram: Int): ArrayData = {
    val bytes = str.getBytes
    val norm = new ByteArrayStringBuilder(bytes.length)
    var pendingSpace = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val c: Int =
        if (b >= 'A' && b <= 'Z') b + 32
        else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) b
        else -1
      if (c >= 0) {
        if (pendingSpace && norm.len > 0) norm.add(' '.toByte)
        pendingSpace = false
        norm.add(c.toByte)
      } else pendingSpace = true
      i += 1
    }
    val n = norm.len
    val count = math.max(n - ngram + 1, 0)
    val out = new Array[Any](count)
    var p = 0
    while (p < count) {
      out(p) = UTF8String.fromBytes(norm.buf, p, ngram)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** The sign-sum bit walk of [[SimHash64]]. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = Fnv64.hashString(arr.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** minhash_text(text, ngram, numHashes, seed) → array<long>.
  *
  * Fused one-pass kernel: tokenizes (lowercase alnum runs — byte-level
  * equivalent of [[graft.functions.TextFunctions.tokens]]), forms word
  * n-gram shingles, FNV-hashes each shingle and folds it into the minhash
  * signature — without materializing token or shingle arrays. Produces
  * *identical* signatures to `MinHashSignature(wordNgrams(text, n))`
  * (shingle hash = FNV over the space-joined shingle string; duplicate
  * shingles don't affect a min). O(len + shingles × numHashes), zero
  * allocation beyond the signature. This is the kernel that makes
  * MinHash-LSH dedup run at corpus scale.
  *
  * Full `doGenCode` (r8): one static [[HashKernels.minhashText]] call —
  * the expression stays inside whole-stage codegen with no
  * CodegenFallback row materialization (the exposure class that made
  * the r6 Hilbert write row weather-dependent).
  */
case class MinHashText(child: Expression, ngram: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(ngram >= 1 && numHashes >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  @transient private lazy val streams: Array[Long] =
    Array.tabulate(numHashes)(i => Fnv64.mix(seed + i))

  override def nullSafeEval(v: Any): Any =
    HashKernels.minhashText(v.asInstanceOf[UTF8String], ngram, numHashes,
      streams)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val streamsRef = ctx.addReferenceObj("mhStreams", streams, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.minhashText(" +
        s"$c, $ngram, $numHashes, $streamsRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_text"
}

/** token_top_stats(text) → struct<n, n_distinct, sum_len, max_word,
  * n_bigrams, max_bigram>: every exact-integer input of the
  * repetition-rule family in ONE fused pass — token count, distinct
  * count, summed token length, the top word's occurrence count, bigram
  * count and the top bigram's count. Exists because the Column
  * formulations (`array_max(transform(array_distinct(ts), w =>
  * size(filter(ts, _ === w))))`) are O(distinct × len) per doc in
  * interpreted HOF lambdas AND re-tokenize per rule (HOF lambdas don't
  * CSE their captured subexpressions) — the Gopher battery paid both,
  * ten times per row. Same byte-level tokenizer as [[MinHashText]] /
  * [[TextNgrams]] — the documented equivalent of
  * [[TextFunctions.tokens]], with the same long-standing caveat: a
  * Unicode char whose LOWERCASE maps into ASCII (U+212A Kelvin,
  * U+0130 İ) tokenizes under the regex path but is a separator here
  * (non-ASCII bytes never start a token). Bigram keys are the space-joined
  * [[TextNgrams]] shingles (tokens contain no spaces, so the join is
  * injective and pair counts are exact). */
case class TokenTopStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("max_word", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("max_bigram", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.tokenTopStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.tokenTopStats($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "token_top_stats"
}

/** band_hashes(sig, bands, rows, seed) → array<long>: the LSH banding
  * keys of a minhash signature — hash b = Spark's
  * `xxhash64(lit(seed), b, slice(sig, b·rows+1, rows))`, reproduced
  * BIT-IDENTICALLY through catalyst's own XXH64 fold (long literal,
  * int band index, then each slice element, from the 42L base seed) in
  * one compiled pass. Exists because the Column formulation
  * (`transform(sequence(…), b => xxhash64(…, slice(sig, …)))`) is an
  * interpreted HOF that materializes a slice per band — the banding
  * stage of a 1M-corpus LSH join paid 32 interpreted slice+hash
  * evaluations per row. A short signature mirrors `slice` semantics
  * (missing elements simply don't fold in). */
case class BandHashes(child: Expression, bands: Int, rows: Int, seed: Long)
    extends UnaryExpression {
  require(bands >= 1 && rows >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects array<bigint>, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.bandHashes(v.asInstanceOf[ArrayData], bands, rows, seed)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.bandHashes(" +
        s"$c, $bands, $rows, ${seed}L);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "band_hashes"
}

/** gopher_aux_stats(text, stopwords) → struct<n_lines, n_distinct_lines,
  * n_bullet, n_ellipsis, n_alpha, n_stop, n_symbol>: the line/word-rule
  * inputs of the Gopher battery in ONE fused pass — non-empty-line
  * count, distinct lines, bullet-prefixed lines (space-trimmed, first
  * char -, * or •), ellipsis-terminated lines (space-rtrimmed, ending
  * "..." or …), alphabetic-token count, distinct required-stopword
  * hits, and #/… symbol chars. Each was previously its own
  * line-split/tokenize + interpreted HOF filter — six extra passes per
  * doc. Char-level walk mirroring the Column semantics exactly
  * ([[TokenTopStats]]' tokenizer for the word rules; trim/rtrim strip
  * ASCII spaces only, the Spark `trim` default). */
case class GopherAuxStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_distinct_lines", IntegerType, nullable = false),
    StructField("n_bullet", IntegerType, nullable = false),
    StructField("n_ellipsis", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_symbol", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    stopwords.foreach(w => h.add(w))
    h
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.gopherAuxStats(v.asInstanceOf[UTF8String], stopSet)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val stopRef = ctx.addReferenceObj("gasStops", stopSet,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.gopherAuxStats(" +
        s"$c, $stopRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "gopher_aux_stats"
}

/** text_ngrams(text, n) → array<string>: word n-gram shingles in one pass —
  * byte-level tokenizer equivalent to `tokens(text)` (lowercase alnum runs),
  * shingles joined with a single space. Exists because composing this from
  * `transform(sequence(...), i => element_at(tokens(text), i))` re-evaluates
  * the regex tokenization per element (Spark HOF lambdas don't CSE their
  * captured subexpressions) — O(T·len) instead of O(len). */
case class TextNgrams(child: Expression, ngram: Int)
    extends UnaryExpression {
  require(ngram >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.textNgrams(v.asInstanceOf[UTF8String], ngram)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.textNgrams($c, $ngram);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "text_ngrams"
}

/** char_ngrams(text, n) → array<string>: character n-grams over the
  * normalized text (lowercased, non-alnum runs collapsed to single spaces,
  * trimmed) in one pass — same rationale as [[TextNgrams]]. */
case class CharNgrams(child: Expression, ngram: Int)
    extends UnaryExpression {
  require(ngram >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.charNgrams(v.asInstanceOf[UTF8String], ngram)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.charNgrams($c, $ngram);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "char_ngrams"
}

private[functions] final class ByteArrayStringBuilder(cap: Int) {
  var buf = new Array[Byte](math.max(cap, 8))
  var len = 0
  def add(b: Byte): Unit = {
    if (len == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
    buf(len) = b; len += 1
  }
}

/** simhash64(tokens) → long: sign-sum of token hash bits. Full
  * `doGenCode` (r8): one static [[HashKernels.simhash64]] call keeps the
  * kernel inside whole-stage codegen (no CodegenFallback row
  * materialization in the SimHash dedup scan). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects array<string>, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.simhash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.simhash64($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** feature_hash(tokens, nDim) → array<float>: the hashing-trick embedder —
  * each token hashes to an index in [0, nDim) and a ±1 sign; values
  * accumulate (reference: docarray/document/mixins/featurehash.py:14-54,
  * which uses md5; we use FNV + splitmix for speed, same semantics). */
case class FeatureHash(child: Expression, nDim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects array<string>, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.featureHash(v.asInstanceOf[ArrayData], nDim)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.featureHash($c, $nDim);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "feature_hash"
}

/** rolling_fingerprint(text, window) → long: min of polynomial rolling hashes
  * over byte windows (a winnowing-style document fingerprint). */
case class RollingFingerprint(child: Expression, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  private val B = 1000003L
  @transient private lazy val bPow: Long = {
    var p = 1L; var i = 0
    while (i < window - 1) { p *= B; i += 1 }
    p
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.rollingFingerprint(v.asInstanceOf[UTF8String], window,
      B, bPow)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.rollingFingerprint(" +
        s"$c, $window, ${B}L, ${bPow}L);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "rolling_fingerprint"
}

/** cdc_chunks(text, window, maskBits[, minLen, maxLen]) → array<string>:
  * content-defined chunking (the rsync/LBFS boundary rule) — cut after
  * every position whose [[RollingFingerprint]]-polynomial window hash,
  * splitmix-mixed, has its low `maskBits` bits zero. Because boundaries
  * depend only on local content, an insertion re-chunks ONLY its
  * neighborhood — exact chunk-hash dedup then survives shifts that break
  * fixed-size or line blocking. Expected chunk length ≈ 2^maskBits.
  * `minLen` suppresses boundaries inside the first `minLen` chars of a
  * chunk; `maxLen > 0` forces one at `maxLen`. Char-level (BMP) so an
  * ANSI-SQL oracle replays it with ord(substr(…)); same B-polynomial and
  * mix as rolling_fingerprint, so the two share one oracle encoding. */
case class CdcChunks(child: Expression, window: Int, maskBits: Int,
    minLen: Int = 0, maxLen: Int = 0)
    extends UnaryExpression {
  require(window >= 2 && maskBits >= 1 && maskBits <= 62)
  require(minLen >= 0 && (maxLen == 0 || maxLen >= math.max(minLen, 1)))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects string, got ${t.sql}")
  }
  private val B = 1000003L
  private val mask = (1L << maskBits) - 1
  @transient private lazy val bPow: Long = {
    var p = 1L; var i = 0
    while (i < window - 1) { p *= B; i += 1 }
    p
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.cdcChunks(v.asInstanceOf[UTF8String], window, mask,
      minLen, maxLen, B, bPow)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.cdcChunks($c, " +
        s"$window, ${mask}L, $minLen, $maxLen, ${B}L, ${bPow}L);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "cdc_chunks"
}

/** cosine_lsh(vec, dim, nPlanes, seed) → long: random-hyperplane signature
  * for cosine similarity — `nPlanes` sign bits of Gaussian-plane dot
  * products, packed into a long. One pass over the vector per plane with
  * the plane matrix materialized once per executor (vs the Column-algebra
  * formulation's 64 separate zip_with/aggregate traversals — this is the
  * map-side cost of embedding dedup at scale). Plane layout matches
  * `java.util.Random(seed).nextGaussian()` drawn row-major [plane][dim],
  * so signatures are bit-identical to the previous formulation. */
case class CosineLsh(child: Expression, dim: Int, nPlanes: Int, seed: Long)
    extends UnaryExpression {
  require(nPlanes > 0 && nPlanes <= 64, "1..64 planes per signature word")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"expects array<float|double>, got ${t.sql}")
  }

  @transient private lazy val planes: Array[Double] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes * dim)(rnd.nextGaussian())
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    HashKernels.cosineLsh(v.asInstanceOf[ArrayData], dim, nPlanes,
      planes, isFloat)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.cosineLsh($c, " +
        s"$dim, $nPlanes, $planesRef, $isFloat);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "cosine_lsh"
}
