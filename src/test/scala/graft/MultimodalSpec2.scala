package graft

import graft.multimodal.Multimodal

/** Resize + audio-window kernels (round-2 additions). */
class MultimodalSpec2 extends SparkTestBase {

  test("resizeFrame: nearest-neighbor downscale and upscale index mapping") {
    val grid = Array.tabulate(8, 8)((r, c) => r * 8 + c)
    val down = Multimodal.resizeFrame(grid, 4, 4)
    // 4x4 from 8x8: output (r,c) samples input (r*2, c*2)
    assert(down(0)(0) == 0 && down(0)(1) == 2 && down(1)(0) == 16 && down(3)(3) == 54)
    val up = Multimodal.resizeFrame(grid, 16, 16)
    assert(up.length == 16 && up(0).length == 16)
    assert(up(15)(15) == grid(7)(7) && up(1)(1) == grid(0)(0))
  }

  test("audioWindowIndices: full windows only, hop spacing, empty when too short") {
    // 1 second at 16 kHz: 16000 samples; 25ms window = 400, 10ms hop = 160
    val w = Multimodal.audioWindowIndices(1000L, 16000, 25, 10)
    assert(w.head == (0L, 400L))
    assert(w(1) == (160L, 560L))
    assert(w.last._2 <= 16000L)
    assert(w.length == (16000 - 400) / 160 + 1)
    assert(Multimodal.audioWindowIndices(10L, 16000, 25, 10).isEmpty)
  }

  test("windowEnergyStub is deterministic and in [0,1)") {
    val p = "some payload".getBytes("UTF-8")
    val e1 = Multimodal.windowEnergyStub(p, 3)
    val e2 = Multimodal.windowEnergyStub(p, 3)
    assert(e1 == e2)
    assert(e1 >= 0.0 && e1 < 1.0)
    assert(Multimodal.windowEnergyStub(p, 4) != e1)
  }
}
