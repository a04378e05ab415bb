"""Pallas SpMV kernels.

Round-1 status: arbitrary-position gathers of x (the SpMV bottleneck) need
Mosaic's ``dynamic_gather``, which only supports batched sublane/lane gathers
with index shape == operand shape.  A high-performance SpMV kernel therefore
needs column-sorted tiles (SELL-style) so each output tile's x reads fall in
few (8, 128) x-tiles — planned for the next round.  Until then, SpMV runs on
the XLA gather + segment_sum path (ops/spmv.py), which is already
memory-bound-reasonable, and on the BSR/BlockedELL block kernels for block
formats.
"""
from __future__ import annotations

PALLAS_IMPLS: dict = {}
