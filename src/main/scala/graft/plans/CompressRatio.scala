package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string's UTF-8 bytes:
  * compressed_size / raw_size. A machine-free repetition detector — near 0
  * for templated/looping text (the patterns a per-line or n-gram rule can
  * miss when the repeating unit is long or irregular), near 1 for
  * high-entropy text — the signal web-corpus pipelines use to drop
  * auto-generated pages wholesale. BEST_SPEED keeps the kernel ~scan-cost;
  * the ratio ordering, which is all the filter consumes, is stable across
  * deflate levels. Empty input → 1.0 (nothing to compress, nothing
  * repeated).
  *
  * Deflate output depends only on the input bytes and fixed parameters, so
  * the signal is deterministic across runs and partitions — but it is
  * java.util.zip-specific, so no SQL-engine oracle (rows-only check).
  */
case class CompressRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_compress_ratio"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) return 1.0
    val deflater = new Deflater(Deflater.BEST_SPEED, true)
    try {
      deflater.setInput(bytes)
      deflater.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!deflater.finished()) compressed += deflater.deflate(buf)
      compressed.toDouble / bytes.length
    } finally deflater.end()
  }

  override protected def withNewChildInternal(newChild: Expression): CompressRatio =
    copy(child = newChild)
}
