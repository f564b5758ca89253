package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Onnx
import graft.operators.Onnx.{Model, Node, Tensor}
import graft.tools.OnnxModelGen

/** The in-repo ONNX subset: protobuf round trip, executor arithmetic vs
  * hand-computed references, and the embedding pipeline's determinism.
  */
class OnnxSpec extends AnyFunSuite {

  test("write → parse round-trips the graph, names and float32 weights") {
    val m = OnnxModelGen.mlp(features = 4, hidden = 3, dims = 2, seed = 42)
    val parsed = Onnx.parse(m.bytes)
    assert(parsed.inputName == "features" && parsed.outputName == "embedding")
    assert(parsed.nodes.map(_.opType) ==
      Seq("MatMul", "Add", "Relu", "MatMul", "Add"))
    val w1 = parsed.initializers("w1")
    assert(w1.rows == 4 && w1.cols == 3)
    // float32 on disk: loaded doubles equal the generator's
    // float32-quantized doubles exactly
    assert(w1.data.toSeq == m.w1.flatten.toSeq)
    assert(parsed.initializers("b2").data.toSeq == m.b2.toSeq)
  }

  test("executor matches hand-computed MatMul/Add/Relu") {
    val model = Model("x", "y",
      initializers = Map(
        "w" -> Tensor(2, 2, Array(1.0, 2.0, 3.0, 4.0)),
        "b" -> Tensor(1, 2, Array(-10.0, 0.5))),
      nodes = Seq(
        Node("MatMul", Seq("x", "w"), Seq("lin")),
        Node("Add", Seq("lin", "b"), Seq("biased")),
        Node("Relu", Seq("biased"), Seq("y"))))
    val out = Onnx.run(model, Tensor(1, 2, Array(1.0, 1.0)))
    // [1,1]·[[1,2],[3,4]] = [4,6]; +[-10,0.5] = [-6,6.5]; relu = [0,6.5]
    assert(out.data.toSeq == Seq(0.0, 6.5))
  }

  test("Gemm, Tanh, Sigmoid and Identity evaluate; unknown op fails") {
    val gemm = Model("x", "y",
      initializers = Map("w" -> Tensor(1, 1, Array(2.0)),
        "b" -> Tensor(1, 1, Array(1.0))),
      nodes = Seq(Node("Gemm", Seq("x", "w", "b"), Seq("y"))))
    assert(Onnx.run(gemm, Tensor(1, 1, Array(3.0))).data.toSeq == Seq(7.0))
    val tanh = Model("x", "y", Map.empty,
      Seq(Node("Tanh", Seq("x"), Seq("y"))))
    assert(Onnx.run(tanh, Tensor(1, 1, Array(0.0))).data.toSeq == Seq(0.0))
    val sig = Model("x", "y", Map.empty,
      Seq(Node("Sigmoid", Seq("x"), Seq("y"))))
    assert(Onnx.run(sig, Tensor(1, 1, Array(0.0))).data.toSeq == Seq(0.5))
    val bad = Model("x", "y", Map.empty,
      Seq(Node("Conv", Seq("x"), Seq("y"))))
    assertThrows[IllegalStateException](Onnx.run(bad, Tensor(1, 1, Array(1.0))))
  }

  test("embedding model: unit norm, deterministic, feature-hash sensitivity") {
    val m = OnnxModelGen.mlp(features = 32, hidden = 16, dims = 8, seed = 7)
    val model = new graft.operators.Embeddings.OnnxEmbeddingModel(m.bytes, 32)
    val a = model.embed("the quick brown fox")
    val b = model.embed("the quick brown fox")
    val c = model.embed("a completely different sentence entirely")
    assert(a.toSeq == b.toSeq, "same text must embed identically")
    assert(a.toSeq != c.toSeq, "different text must embed differently")
    val norm = math.sqrt(a.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9, s"embedding norm $norm != 1")
    assert(a.length == 8)
  }
}
