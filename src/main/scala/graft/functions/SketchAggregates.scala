package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Typed imperative aggregates for the dedup sketches (SURVEY §2.11
  * surface, engine extension).
  *
  * Why not 64 declarative `min(xxhash64(i, s))` columns (round 1's
  * shape): that plan re-hashes every shingle string 64 times per row
  * AND generates so much aggregate code that the split methods run
  * interpreted until (if ever) C2 compiles them — measured as
  * 23–98 s/run warmup swings on the sf0.1 corpus before settling at
  * 3.4 s. These aggregates do the row work in one tight JVM loop over
  * a primitive buffer: the input hash is computed once (codegen'd
  * `xxhash64`), permutations derive from it with a long mix (the
  * standard cheap-permutation MinHash construction: h_i = mix(h0, i)),
  * and the buffer is a `long[]` with element-wise min/merge — the exact
  * partial-aggregation monoid shape, so map-side combine still shrinks
  * the shuffle to `perms` longs per doc.
  */
object SketchAggregates {

  /** MinHash signature: per permutation i, the min over input rows of
    * `XXH64.hashLong(h0, XXH64.hashInt(i, 42))` where `h0` is the
    * (already hashed) shingle — exactly what the built-in
    * `xxhash64(lit(i), h0)` computes, so the interpreted expression
    * spelling [[graft.ext.Dedup.minHashSignature]] stays bit-identical
    * (pinned by `DedupSpec`). The per-permutation seeds are precomputed
    * once per operator instance.
    */
  case class MinHashSignatureAgg(
      child: Expression,
      perms: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def prettyName: String = "minhash_signature"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    @transient private lazy val seeds: Array[Long] =
      Array.tabulate(perms)(i => XXH64.hashInt(i, 42L))

    override def createAggregationBuffer(): Array[Long] =
      Array.fill(perms)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h0 = v.asInstanceOf[Long]
        val s = seeds
        var i = 0
        while (i < perms) {
          val h = XXH64.hashLong(h0, s(i))
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < perms) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * perms)
      bb.asLongBuffer().put(buf)
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val out = new Array[Long](perms)
      ByteBuffer.wrap(bytes).asLongBuffer().get(out)
      out
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignatureAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignatureAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): MinHashSignatureAgg =
      copy(child = newChild)
  }

  /** SimHash bit votes + row count in one `long[65]` buffer; eval
    * assembles the 64-bit fingerprint (`ones*2 > n`, ties → 0) —
    * bit-identical to [[graft.ext.Dedup.simHash64]] on the same token
    * hashes.
    */
  case class SimHashAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def prettyName: String = "simhash_agg"
    override def dataType: DataType = LongType
    override def nullable: Boolean = false

    override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var b = 0
        while (b < 64) { buf(b) += (h >>> b) & 1L; b += 1 }
        buf(64) += 1
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 65) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = {
      val n = buf(64)
      var fp = 0L
      var b = 0
      while (b < 64) { if (buf(b) * 2 > n) fp |= 1L << b; b += 1 }
      fp
    }

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * 65)
      bb.asLongBuffer().put(buf)
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val out = new Array[Long](65)
      ByteBuffer.wrap(bytes).asLongBuffer().get(out)
      out
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
      copy(child = newChild)
  }

  def minHashSignature(h0: Column, perms: Int): Column =
    GraftColumnBridge.column(
      MinHashSignatureAgg(GraftColumnBridge.expression(h0), perms)
        .toAggregateExpression())

  def simHashVotes(h: Column): Column =
    GraftColumnBridge.column(
      SimHashAgg(GraftColumnBridge.expression(h)).toAggregateExpression())
}
