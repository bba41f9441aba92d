package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a NATIVE mergeable aggregate —
  * the extension tier t31's mapPartitions sketch does not exercise: a
  * [[TypedImperativeAggregate]] participates in Spark's real partial-
  * aggregation protocol (map-side update → serialize into the aggregation
  * buffer → exchange → merge → eval), which is how DataSketches/HLL ship
  * in production engines, and what lets the SAME sketch also maintain
  * per-GROUP summaries or feed AQE-planned partial aggregation — shapes a
  * hand-rolled mapPartitions pass cannot take.
  *
  * Summary semantics (Misra-Gries '82; merge per Agarwal et al. PODS'12):
  * k counters; update increments a present key, inserts if there is room,
  * otherwise decrements ALL counters (dropping zeros); merge adds the two
  * count maps then subtracts the (k+1)-th largest count from every entry,
  * dropping non-positives. The guarantee that survives both paths: any
  * item with true frequency > N/k is IN the summary — recall 1.0 on
  * heavy hitters; counts are approximate and partitioning-dependent, so
  * [[eval]] surfaces only the candidate KEY SET (sorted for a stable
  * plan-independent shape) and callers verify exactly (t42's second pass)
  * — the t31 discipline: the sketch proposes, exact counting disposes.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries_agg"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(key)
      if (cur != 0L || buf.containsKey(key)) buf.put(key, cur + 1)
      else if (buf.size < k) buf.put(key, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from all; ≥ (size-k) entries go
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - k - 1) // (k+1)-th largest
      decrementAll(buf, cut)
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    scala.util.Sorting.quickSort(keys)
    new GenericArrayData(keys.map(UTF8String.fromString(_): Any))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
