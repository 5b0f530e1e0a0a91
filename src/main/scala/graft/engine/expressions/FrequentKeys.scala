package graft.engine.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-keys summary with `capacity` counters.
  *
  * Invariant (the MG guarantee): after observing `n` items, every key whose
  * true count exceeds `decremented` (the total mass removed by evictions,
  * itself ≤ n / (capacity + 1)) is present, and each stored count is a lower
  * bound on the true count that undercounts by at most `decremented`.
  * Tracking `decremented` exactly (instead of bounding it by n/(c+1)) keeps
  * the merge bound tight across arbitrary merge trees (Agarwal et al. 2012,
  * "Mergeable Summaries": summing per-summary eviction mass preserves the
  * per-key undercount bound).
  */
final class MGBuffer(val capacity: Int) {
  val counts = new mutable.HashMap[UTF8String, Long]
  /** Total count mass removed by evictions — the exact undercount bound. */
  var decremented: Long = 0L

  def add(key: UTF8String, by: Long): Unit = {
    counts.get(key) match {
      case Some(c) => counts.update(key, c + by)
      case None =>
        if (counts.size < capacity) {
          // The input UTF8String may alias a reused unsafe-row buffer;
          // copy before retaining it past this call.
          counts.update(key.clone(), by)
        } else {
          // Evict: subtract the map's minimum count (a batch of classic
          // decrement-by-1 rounds), drop zeros, then re-offer the remainder.
          val m = math.min(by, counts.valuesIterator.min)
          decremented += m
          counts.filterInPlace((_, c) => c > m)
          counts.mapValuesInPlace((_, c) => c - m)
          if (by > m) add(key, by - m)
        }
    }
  }

  def mergeFrom(other: MGBuffer): Unit = {
    decremented += other.decremented
    other.counts.foreach { case (k, c) => add(k, c) }
  }
}

/** Misra–Gries frequent-keys aggregate: a fixed-size mergeable sketch whose
  * output is `array<struct<key: string, lb: long>>` sorted (lb desc, key asc)
  * plus the eviction mass, as `struct<entries: array<...>, dec: long>`.
  *
  * This is the PASS-1 half of exact distributed heavy hitters (see
  * `Analytics.heavyHitters`): a `groupBy(key).count()` on a high-cardinality
  * key (URL domains, tokens) at corpus scale shuffles every distinct key;
  * this aggregate reduces each task to `capacity` counters before the
  * shuffle, and the MG guarantee makes the surviving key set a SUPERSET of
  * every key with true share > 1/(capacity+1) — so an exact recount of just
  * the candidates (pass 2) loses nothing. Null keys are skipped (SQL
  * aggregate convention).
  */
case class FrequentKeys(key: Expression, capacity: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer]
    with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive: $capacity")

  override def child: Expression = key

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_frequent_keys requires a string key, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("entries", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("dec", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def prettyName: String = "graft_frequent_keys"

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val k = key.eval(input)
    if (k != null) b.add(k.asInstanceOf[UTF8String], 1L)
    b
  }

  override def merge(b: MGBuffer, other: MGBuffer): MGBuffer = {
    b.mergeFrom(other); b
  }

  override def eval(b: MGBuffer): Any = {
    val sorted = b.counts.toArray.sortWith { case ((k1, c1), (k2, c2)) =>
      c1 > c2 || (c1 == c2 && k1.compareTo(k2) < 0)
    }
    InternalRow(
      new GenericArrayData(sorted.map { case (k, c) =>
        InternalRow(k, c): Any
      }),
      b.decremented)
  }

  override def serialize(b: MGBuffer): Array[Byte] = {
    var bytes = 0
    b.counts.foreach { case (k, _) => bytes += 12 + k.numBytes() }
    val bb = ByteBuffer.allocate(16 + bytes)
    bb.putInt(b.capacity).putInt(b.counts.size).putLong(b.decremented)
    b.counts.foreach { case (k, c) =>
      val kb = k.getBytes
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new MGBuffer(bb.getInt())
    val n = bb.getInt()
    b.decremented = bb.getLong()
    var j = 0
    while (j < n) {
      val kb = new Array[Byte](bb.getInt()); bb.get(kb)
      b.counts.update(UTF8String.fromBytes(kb), bb.getLong())
      j += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentKeys =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentKeys =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentKeys =
    copy(key = newChild)
}
