package graft.functions

import org.apache.spark.sql.SparkSession

import graft.codec.{ColumnCodec, FlBytes, ReferenceFl, RleBytes}

/** SQL-registered codec surface (SURVEY.md §2 Table B "UDF/UDAF" row,
  * §7 M5): the byte-level codecs exposed as Spark SQL functions, so a
  * user querying the chunk table from SQL can decode a column without
  * dropping into Scala — the SQL analog of the reference CLI's
  * decompress surface (/root/reference/src/main.cu:131-169).
  *
  * All functions are deterministic pure byte transforms over BinaryType;
  * they run inside codegen'd Project nodes (a Scala UDF here is the right
  * tool: the kernels are opaque byte loops either way, and the hot path —
  * bulk encode — stays in the mapPartitions kernel, not per-row SQL).
  *
  *   fl_encode(bin)  -> self-describing FL bit-pack block (FlBytes;
  *                      bit-compatible with the reference fl_cpu.cu path)
  *   fl_decode(bin)  -> original bytes
  *   fl_size(bin)    -> exact reference-FL on-disk size of the input
  *                      (the north-rule baseline, without materializing)
  *   rle_encode(bin) -> RLE block (value,varint-count runs)
  *   rle_decode(bin) -> original bytes
  *   col_decode_bytes(block) -> array<binary>: decode one ColumnCodec
  *                      chunk-column block (any byte form the selector
  *                      emits: dict / composite / fl_plain)
  */
object GraftFunctions {

  val Names: Seq[String] =
    Seq("fl_encode", "fl_decode", "fl_size", "rle_encode", "rle_decode", "col_decode_bytes")

  def register(spark: SparkSession): Unit = {
    spark.udf.register("fl_encode", (data: Array[Byte]) =>
      if (data == null) null else FlBytes.encode(data))
    spark.udf.register("fl_decode", (block: Array[Byte]) =>
      if (block == null) null else FlBytes.decode(block))
    spark.udf.register("fl_size", (data: Array[Byte]) =>
      if (data == null) null else java.lang.Long.valueOf(ReferenceFl.fileSizeOf(data)))
    spark.udf.register("rle_encode", (data: Array[Byte]) =>
      if (data == null) null else RleBytes.encode(data))
    spark.udf.register("rle_decode", (block: Array[Byte]) =>
      if (block == null) null else RleBytes.decode(block))
    spark.udf.register("col_decode_bytes", (block: Array[Byte]) =>
      if (block == null) null else ColumnCodec.decodeBytes(block))
  }
}
