package graft.operators

import graft.serde.Protobuf
import graft.serde.Protobuf.Msg

/** Minimal ONNX model loader + executor (the public onnx.proto schema
  * over [[graft.serde.Protobuf]]): parses ModelProto → GraphProto →
  * initializers/nodes and evaluates the graph in node order. Supports
  * the feed-forward operator subset an embedding head needs — MatMul,
  * Gemm, Add (row-broadcast), Relu, Tanh, Sigmoid, Identity — which is
  * exactly the shape of the pooled-output projection the reference's
  * in-process MiniLM session applies (`debezium-ai/
  * debezium-ai-embeddings/.../FieldToEmbedding.java` via langchain4j's
  * ONNX runtime; that runtime is env-blocked, so the model FILE format
  * and executor are implemented directly).
  *
  * Numerics: tensors are float32 on disk (TensorProto FLOAT) and
  * accumulation runs in float64 left-to-right — a deterministic,
  * engine-reproducible choice that lets a SQL oracle replay the exact
  * arithmetic with weight literals.
  */
object Onnx {

  /** Row-major matrix; vectors are 1×n. */
  final case class Tensor(rows: Int, cols: Int, data: Array[Double]) {
    require(data.length == rows * cols,
      s"tensor ${rows}x$cols but ${data.length} values")
  }

  final case class Node(opType: String, inputs: Seq[String],
                        outputs: Seq[String])

  final case class Model(inputName: String, outputName: String,
                         initializers: Map[String, Tensor],
                         nodes: Seq[Node])

  // onnx.proto field numbers
  private object F {
    val ModelGraph = 7
    val GraphNode = 1
    val GraphInit = 5
    val GraphInput = 11
    val GraphOutput = 12
    val NodeInput = 1
    val NodeOutput = 2
    val NodeOpType = 4
    val TensorDims = 1
    val TensorDataType = 2
    val TensorFloatData = 4
    val TensorName = 8
    val TensorRawData = 9
    val ValueInfoName = 1
  }

  private def parseTensor(m: Msg): (String, Tensor) = {
    val name = m.string(F.TensorName).getOrElse(
      throw new IllegalStateException("unnamed initializer"))
    require(m.varint(F.TensorDataType).contains(1L),
      s"initializer $name is not FLOAT")
    // dims may arrive unpacked (varints) or packed (one bytes field)
    val dims: Seq[Long] = {
      val unpacked = m.varints(F.TensorDims)
      if (unpacked.nonEmpty) unpacked
      else m.bytes(F.TensorDims).flatMap { b =>
        val vals = Seq.newBuilder[Long]
        var pos = 0
        while (pos < b.length) {
          var v = 0L; var shift = 0; var cont = true
          while (cont) {
            val x = b(pos) & 0xff; pos += 1
            v |= (x & 0x7fL) << shift; shift += 7; cont = (x & 0x80) != 0
          }
          vals += v
        }
        vals.result()
      }
    }
    val (rows, cols) = dims match {
      case Seq(n) => (1, n.toInt)
      case Seq(r, c) => (r.toInt, c.toInt)
      case other => throw new IllegalStateException(
        s"initializer $name has unsupported rank ${other.size}")
    }
    val data: Array[Double] = m.firstBytes(F.TensorRawData) match {
      case Some(raw) =>
        val bb = java.nio.ByteBuffer.wrap(raw)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Array.fill(raw.length / 4)(bb.getFloat().toDouble)
      case None =>
        // float_data: packed fixed32s in one length-delimited field
        m.bytes(F.TensorFloatData).flatMap { b =>
          val bb = java.nio.ByteBuffer.wrap(b)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          Array.fill(b.length / 4)(bb.getFloat().toDouble)
        }.toArray
    }
    name -> Tensor(rows, cols, data)
  }

  def parse(modelBytes: Array[Byte]): Model = {
    val graph = Protobuf.decode(modelBytes).msg(F.ModelGraph).getOrElse(
      throw new IllegalStateException("ModelProto has no graph"))
    val inits = graph.msgs(F.GraphInit).map(parseTensor).toMap
    val nodes = graph.msgs(F.GraphNode).map { n =>
      Node(n.string(F.NodeOpType).getOrElse("?"),
        n.strings(F.NodeInput), n.strings(F.NodeOutput))
    }
    def ioName(no: Int): String = graph.msgs(no).headOption
      .flatMap(_.string(F.ValueInfoName)).getOrElse(
        throw new IllegalStateException("graph missing input/output"))
    Model(ioName(F.GraphInput), ioName(F.GraphOutput), inits, nodes)
  }

  private def matmul(a: Tensor, b: Tensor): Tensor = {
    require(a.cols == b.rows, s"matmul ${a.rows}x${a.cols} · ${b.rows}x${b.cols}")
    val out = new Array[Double](a.rows * b.cols)
    var i = 0
    while (i < a.rows) {
      var j = 0
      while (j < b.cols) {
        var acc = 0.0
        var k = 0
        while (k < a.cols) { // left-to-right accumulation, oracle-replayable
          acc += a.data(i * a.cols + k) * b.data(k * b.cols + j)
          k += 1
        }
        out(i * b.cols + j) = acc
        j += 1
      }
      i += 1
    }
    Tensor(a.rows, b.cols, out)
  }

  private def add(a: Tensor, b: Tensor): Tensor = {
    require(a.cols == b.cols && (b.rows == 1 || b.rows == a.rows),
      s"add ${a.rows}x${a.cols} + ${b.rows}x${b.cols}")
    val out = new Array[Double](a.data.length)
    var i = 0
    while (i < a.rows) {
      var j = 0
      while (j < a.cols) {
        val bi = (if (b.rows == 1) 0 else i) * b.cols + j
        out(i * a.cols + j) = a.data(i * a.cols + j) + b.data(bi)
        j += 1
      }
      i += 1
    }
    Tensor(a.rows, a.cols, out)
  }

  private def unary(a: Tensor, f: Double => Double): Tensor =
    Tensor(a.rows, a.cols, a.data.map(f))

  /** Run the graph on one input vector. */
  def run(model: Model, input: Tensor): Tensor = {
    val env = scala.collection.mutable.Map[String, Tensor](
      model.inputName -> input) ++= model.initializers
    model.nodes.foreach { n =>
      def in(i: Int): Tensor = env.getOrElse(n.inputs(i),
        throw new IllegalStateException(
          s"node ${n.opType} input ${n.inputs(i)} not computed yet"))
      val out = n.opType match {
        case "MatMul" => matmul(in(0), in(1))
        case "Gemm" => add(matmul(in(0), in(1)), in(2))
        case "Add" => add(in(0), in(1))
        case "Relu" => unary(in(0), x => if (x > 0) x else 0.0)
        case "Tanh" => unary(in(0), math.tanh)
        case "Sigmoid" => unary(in(0), x => 1.0 / (1.0 + math.exp(-x)))
        case "Identity" => in(0)
        case other =>
          throw new IllegalStateException(s"unsupported op $other")
      }
      env(n.outputs.head) = out
    }
    env.getOrElse(model.outputName,
      throw new IllegalStateException("graph never produced its output"))
  }

  // ---- model writer (fixture generation + tests) ----

  /** Serialize a single-input/single-output model of the supported op
    * set back to ONNX bytes (raw_data float32 initializers).
    */
  def write(model: Model): Array[Byte] = {
    val w = new Protobuf.Writer
    w.varint(1, 8L) // ir_version
    w.string(2, "graft")
    w.msgField(8, _.varint(2, 13L)) // opset_import { version: 13 }
    w.msgField(F.ModelGraph, { g =>
      g.string(2, "graft-graph")
      model.nodes.foreach { n =>
        g.msgField(F.GraphNode, { nw =>
          n.inputs.foreach(nw.string(F.NodeInput, _))
          n.outputs.foreach(nw.string(F.NodeOutput, _))
          nw.string(F.NodeOpType, n.opType)
        })
      }
      model.initializers.toSeq.sortBy(_._1).foreach { case (name, t) =>
        g.msgField(F.GraphInit, { tw =>
          tw.varint(F.TensorDims, t.rows.toLong)
          tw.varint(F.TensorDims, t.cols.toLong)
          tw.varint(F.TensorDataType, 1L) // FLOAT
          tw.string(F.TensorName, name)
          val bb = java.nio.ByteBuffer.allocate(t.data.length * 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          t.data.foreach(d => bb.putFloat(d.toFloat))
          tw.bytes(F.TensorRawData, bb.array())
        })
      }
      g.msgField(F.GraphInput, _.string(F.ValueInfoName, model.inputName))
      g.msgField(F.GraphOutput, _.string(F.ValueInfoName, model.outputName))
    })
    w.result()
  }
}
