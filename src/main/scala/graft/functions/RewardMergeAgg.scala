package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.CanonicalJson
import graft.schema.Schema.{EmptyRewardsJson, NoRewardsValue}

/** Per-reward-key merge state. A key's VALUE is the one from the map
  * with the maximal (srcOrder, seq, mapBytes) ordering tuple (the
  * reference's dict.update() fold: later maps overwrite); the key's
  * SUMMATION POSITION is fixed by the minimal tuple (plus the field's
  * document-order index inside that map), because the previous
  * implementation summed doubles in first-insertion order and the
  * reward hash is sensitive to float summation order. srcOrder/seq
  * are boxed: a NULL sorts FIRST, exactly as the struct field did
  * under ascending `sort_array`.
  */
private[graft] final class RewardKeyState(
    var firstSrc: java.lang.Long, var firstSeq: java.lang.Long,
    var firstMap: Array[Byte], var firstPos: Int,
    var winSrc: java.lang.Long, var winSeq: java.lang.Long,
    var winMap: Array[Byte], var valueJson: String)

/** J1/G1 rewards-map union as a mergeable `TypedImperativeAggregate`
  * (reference: src/ingest/partition.py:270-338 merges per-decision
  * reward dicts in memory). Replaces the former
  * `sort_array(collect_list(struct(...)))` + per-row UDF, which
  * buffered EVERY reward row's full map per group before folding — a
  * hot decision_id with ~10⁶ rewards made one unbounded aggregation
  * buffer. Here the buffer holds one entry per DISTINCT reward key
  * (keys are unique reward message-ids, each entry O(its own map's
  * bytes)), update folds rows incrementally, and merge combines
  * partial buffers — so map-side partial aggregation actually bounds
  * what crosses the shuffle.
  *
  * Bit-identity with the old path, spec-proven
  * (`RewardMergeAggSpec`):
  *  - per-key winner = max (srcOrder, seq, map-bytes) tuple, the same
  *    order `sort_array` gave the fold (UTF8String's unsigned
  *    byte-wise comparison, replicated in [[RewardMergeAgg.compare]]);
  *  - Σ reward runs in the old fold's key-insertion order
  *    (min tuple, then field position within that map);
  *  - serialization is [[CanonicalJson.dumps]] (sorted keys), so only
  *    the sum — not the JSON — depends on insertion order;
  *  - "{}" / null / unparseable maps contribute nothing; no keys →
  *    ("{}", 0.0).
  */
case class RewardMergeAgg(srcOrder: Expression, seq: Expression, rewards: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, RewardKeyState]] {

  import RewardMergeAgg.compare

  override def children: Seq[Expression] = Seq(srcOrder, seq, rewards)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(srcOrder = newChildren(0), seq = newChildren(1), rewards = newChildren(2))

  override def nullable: Boolean = false

  /** update() folds srcOrder/seq via `Number.longValue`; a Decimal (or
    * any other non-integral) column would otherwise surface as a
    * runtime MatchError mid-aggregation — reject it at analysis time.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    def integral(e: Expression, name: String): Seq[String] = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType | NullType => Nil
      case t => Seq(s"$name must be an integral type, got ${t.catalogString}")
    }
    val errs = integral(srcOrder, "src_order") ++ integral(seq, "seq") ++
      (rewards.dataType match {
        case StringType | NullType => Nil
        case t => Seq(s"rewards must be STRING, got ${t.catalogString}")
      })
    if (errs.isEmpty) TypeCheckSuccess else TypeCheckFailure(errs.mkString("; "))
  }

  override def dataType: DataType = StructType(Seq(
    StructField("rewards", StringType, nullable = false),
    StructField("reward", DoubleType, nullable = false)))

  override def prettyName: String = "merge_reward_maps"

  override def createAggregationBuffer(): mutable.HashMap[String, RewardKeyState] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, RewardKeyState],
      input: InternalRow): mutable.HashMap[String, RewardKeyState] = {
    val r = rewards.eval(input)
    if (r == null) return buffer
    val mapBytes = r.asInstanceOf[UTF8String].getBytes
    // cheap skip for the dominant no-rewards spelling
    if (mapBytes.length == 2 && mapBytes(0) == '{' && mapBytes(1) == '}') return buffer
    // null src/seq participate with nulls-FIRST ordering (they sorted
    // to the front of the old ascending fold — dropping them would
    // silently lose their keys)
    val src: java.lang.Long = srcOrder.eval(input) match {
      case null => null
      case n: java.lang.Number => java.lang.Long.valueOf(n.longValue())
    }
    val sq: java.lang.Long = seq.eval(input) match {
      case null => null
      case n: java.lang.Number => java.lang.Long.valueOf(n.longValue())
    }
    CanonicalJson.tryParseBytes(mapBytes).foreach { node =>
      var pos = 0
      node.properties().asScala.foreach { e =>
        val key = e.getKey
        val valueJson = e.getValue.toString
        buffer.get(key) match {
          case None =>
            buffer.update(key, new RewardKeyState(
              src, sq, mapBytes, pos, src, sq, mapBytes, valueJson))
          case Some(st) =>
            if (compare(src, sq, mapBytes, st.firstSrc, st.firstSeq, st.firstMap) < 0) {
              st.firstSrc = src; st.firstSeq = sq; st.firstMap = mapBytes; st.firstPos = pos
            }
            if (compare(src, sq, mapBytes, st.winSrc, st.winSeq, st.winMap) > 0) {
              st.winSrc = src; st.winSeq = sq; st.winMap = mapBytes; st.valueJson = valueJson
            }
        }
        pos += 1
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, RewardKeyState],
      other: mutable.HashMap[String, RewardKeyState]): mutable.HashMap[String, RewardKeyState] = {
    other.foreach { case (key, o) =>
      buffer.get(key) match {
        case None => buffer.update(key, o)
        case Some(st) =>
          if (compare(o.firstSrc, o.firstSeq, o.firstMap, st.firstSrc, st.firstSeq, st.firstMap) < 0 ||
              (compare(o.firstSrc, o.firstSeq, o.firstMap, st.firstSrc, st.firstSeq, st.firstMap) == 0 &&
                o.firstPos < st.firstPos)) {
            st.firstSrc = o.firstSrc; st.firstSeq = o.firstSeq
            st.firstMap = o.firstMap; st.firstPos = o.firstPos
          }
          if (compare(o.winSrc, o.winSeq, o.winMap, st.winSrc, st.winSeq, st.winMap) > 0) {
            st.winSrc = o.winSrc; st.winSeq = o.winSeq
            st.winMap = o.winMap; st.valueJson = o.valueJson
          }
      }
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, RewardKeyState]): Any = {
    if (buffer.isEmpty)
      return InternalRow(UTF8String.fromString(EmptyRewardsJson), NoRewardsValue)
    // first-insertion order of the old ascending fold: by the minimal
    // (src, seq, mapBytes) tuple a key appeared in, then by the key's
    // document-order position inside that map
    val entries = buffer.toArray
    java.util.Arrays.sort(entries,
      (a: (String, RewardKeyState), b: (String, RewardKeyState)) => {
        val c = compare(a._2.firstSrc, a._2.firstSeq, a._2.firstMap,
          b._2.firstSrc, b._2.firstSeq, b._2.firstMap)
        if (c != 0) c else Integer.compare(a._2.firstPos, b._2.firstPos)
      })
    val acc = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
    var sum = 0.0
    entries.foreach { case (key, st) =>
      val node = CanonicalJson.parse(st.valueJson)
      sum += node.doubleValue()
      acc.set[com.fasterxml.jackson.databind.JsonNode](key, node)
    }
    InternalRow(UTF8String.fromString(CanonicalJson.dumps(acc)), sum)
  }

  override def serialize(buffer: mutable.HashMap[String, RewardKeyState]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (key, st) =>
      writeBytes(out, key.getBytes("UTF-8"))
      writeOptLong(out, st.firstSrc); writeOptLong(out, st.firstSeq)
      writeBytes(out, st.firstMap); out.writeInt(st.firstPos)
      writeOptLong(out, st.winSrc); writeOptLong(out, st.winSeq)
      writeBytes(out, st.winMap)
      writeBytes(out, st.valueJson.getBytes("UTF-8"))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, RewardKeyState] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buffer = mutable.HashMap.empty[String, RewardKeyState]
    var i = 0
    while (i < n) {
      val key = new String(readBytes(in), "UTF-8")
      val firstSrc = readOptLong(in); val firstSeq = readOptLong(in)
      val firstMap = readBytes(in); val firstPos = in.readInt()
      val winSrc = readOptLong(in); val winSeq = readOptLong(in)
      val winMap = readBytes(in)
      val valueJson = new String(readBytes(in), "UTF-8")
      buffer.update(key, new RewardKeyState(
        firstSrc, firstSeq, firstMap, firstPos, winSrc, winSeq, winMap, valueJson))
      i += 1
    }
    buffer
  }

  private def writeOptLong(out: DataOutputStream, v: java.lang.Long): Unit =
    if (v == null) out.writeBoolean(false)
    else { out.writeBoolean(true); out.writeLong(v.longValue()) }

  private def readOptLong(in: DataInputStream): java.lang.Long =
    if (in.readBoolean()) java.lang.Long.valueOf(in.readLong()) else null

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length); out.write(b)
  }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val b = new Array[Byte](in.readInt()); in.readFully(b); b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RewardMergeAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): RewardMergeAgg =
    copy(inputAggBufferOffset = newOffset)
}

object RewardMergeAgg {

  /** (src, seq, mapBytes) tuple order; null longs sort FIRST (as the
    * ascending struct sort ordered null fields) and byte comparison
    * is unsigned lexicographic — exactly UTF8String.compareTo, which
    * is what `sort_array` used on the struct's string field.
    */
  private[graft] def compare(aSrc: java.lang.Long, aSeq: java.lang.Long, aMap: Array[Byte],
      bSrc: java.lang.Long, bSeq: java.lang.Long, bMap: Array[Byte]): Int = {
    var c = compareNullsFirst(aSrc, bSrc)
    if (c != 0) return c
    c = compareNullsFirst(aSeq, bSeq)
    if (c != 0) return c
    if (aMap eq bMap) return 0
    val n = math.min(aMap.length, bMap.length)
    var i = 0
    while (i < n) {
      c = Integer.compare(aMap(i) & 0xff, bMap(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    Integer.compare(aMap.length, bMap.length)
  }

  private def compareNullsFirst(a: java.lang.Long, b: java.lang.Long): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else java.lang.Long.compare(a.longValue(), b.longValue())
}
