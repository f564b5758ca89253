package graft.tools

import graft.operators.Onnx
import graft.operators.Onnx.{Model, Node, Tensor}

/** Deterministic ONNX MODEL FIXTURE: a seeded two-layer MLP embedding
  * head serialized as a real `.onnx` ModelProto (no pretrained weights
  * ship in this environment, so the model file is generated — the
  * bytes, the parse, and the execution are the real format end to
  * end). Weights are float32-quantized before serialization so the
  * in-file values, the executor's loaded values, and any oracle
  * replaying them from literals are the same doubles.
  */
object OnnxModelGen {

  final case class Mlp(bytes: Array[Byte], w1: Array[Array[Double]],
                       b1: Array[Double], w2: Array[Array[Double]],
                       b2: Array[Double])

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def weight(seed: Long, i: Long): Double = {
    val h = splitmix64(seed * 0x9E3779B97F4A7C15L + i)
    // uniform [-0.5, 0.5), rounded through float32 (the on-disk dtype)
    (((h >>> 11).toDouble / (1L << 53).toDouble) - 0.5).toFloat.toDouble
  }

  /** features → hidden (Relu) → dims, as MatMul/Add/Relu/MatMul/Add. */
  def mlp(features: Int, hidden: Int, dims: Int, seed: Long): Mlp = {
    var i = 0L
    def next(): Double = { i += 1; weight(seed, i) }
    val w1 = Array.fill(features, hidden)(next())
    val b1 = Array.fill(hidden)(next())
    val w2 = Array.fill(hidden, dims)(next())
    val b2 = Array.fill(dims)(next())
    val model = Model(
      inputName = "features", outputName = "embedding",
      initializers = Map(
        "w1" -> Tensor(features, hidden, w1.flatten),
        "b1" -> Tensor(1, hidden, b1),
        "w2" -> Tensor(hidden, dims, w2.flatten),
        "b2" -> Tensor(1, dims, b2)),
      nodes = Seq(
        Node("MatMul", Seq("features", "w1"), Seq("h_lin")),
        Node("Add", Seq("h_lin", "b1"), Seq("h_biased")),
        Node("Relu", Seq("h_biased"), Seq("h")),
        Node("MatMul", Seq("h", "w2"), Seq("o_lin")),
        Node("Add", Seq("o_lin", "b2"), Seq("embedding"))))
    Mlp(Onnx.write(model), w1, b1, w2, b2)
  }
}
