"""Pallas TPU kernels — EXPERIMENTAL, off the production serving path.

Status (measured, BENCH_NOTES.md rounds 1-2): every Pallas formulation
of the transition hot chain loses to XLA's conv emitter on this chip —
Mosaic's int8 matmul throughput (~150 TOPS at these shapes) is the
kernel-side ceiling vs ~219-250 effective TOPS for the emitter, and
implicit-window/im2col schedules pay VMEM copy traffic XLA avoids.  The
production bf16 path is plain XLA convs; the production int8 serving
path is `scmgan_tpu.models.quantized.transition_int8_v2` (pure XLA) with
`scmgan_tpu.models.world_model.decode_fused` — neither imports anything
from this package.

The kernels are kept as (a) the documented negative result backing that
choice, (b) bit-exact alternates for cross-checking the XLA paths
(`tests/test_native_and_pallas.py`), and (c) a starting point if a
future Mosaic release lifts the int8 matmul ceiling.

FROZEN (round 4): this package is a completed study, not maintained
serving code — no production path imports it, and no further kernels
are planned against the current Mosaic toolchain.  The one remaining
below-roofline target (the decoder chain, 0.89 ms/step ~= 12% of
serving at batch 256, BENCH_NOTES) was examined and deliberately left
on XLA: its convs are small-channel (16->64->3 after decode_fused
weight folding), exactly the shape class where every Pallas
formulation above lost to the XLA emitter, and the maximum all-in win
is bounded by Amdahl at ~13% of serving throughput.
"""
