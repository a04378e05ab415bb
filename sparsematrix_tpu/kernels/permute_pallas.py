"""Window-local 1024-permute kernel — the device half of the Clos
planned permutation (ops/permute_clos.py).

Each 1024-element window (viewed (8, 128): sublane c, lane p) applies an
ARBITRARY bijection via the 3-stage (8, 128) gather chain proven by the
octet SpMV kernel (kernels/spmv_octet.py — the only gather shape Mosaic
compiles, CLAUDE.md):

    t1[c, m] = xw[c, POS[c, m]]     (pos plane:   axis-1 gather)
    t2[u, m] = t1[CH[u, m], m]      (chunk plane: axis-0 gather)
    y [u, l] = t2[u, RT[u, l]]      (lane route:  axis-1 gather)

For a full window bijection every (u, m) and (c, m) cell carries exactly
one element (1024 elements, 1024 middle slots), and the middle-slot
assignment m is a 128-edge-coloring of the (u × c) bipartite multigraph
— König guarantees it exists; native/codec.cc smtpu_edge_color builds it.
This is a rearrangeable 3-stage Clos network C(128, 128, 8): any
permutation routes with zero spill, so there are no sentinels and no
masks here, unlike the sparse octet layout.

No reference analogue (the reference reorders on the host,
sparse-matrix.cc:102-137); built for the SpGEMM b/c-permutes where the
sort-network permute (ops/permute.py) was the measured bottleneck.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_permute"]

_LANES = 128


def _wperm_kernel(pos_ref, chk_ref, rte_ref, x_ref, o_ref, *, group: int):
    for b in range(group):
        xw = x_ref[b]
        t1 = jnp.take_along_axis(xw, pos_ref[b], axis=1)
        t2 = jnp.take_along_axis(t1, chk_ref[b], axis=0)
        o_ref[b] = jnp.take_along_axis(t2, rte_ref[b], axis=1)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def window_permute(x, pos, chk, rte, *, group: int = 16,
                   interpret: bool = False):
    """Apply per-window bijections: x, out are (W, 8, 128); planes are
    (W, 8, 128) int8 (int32 under interpret — Mosaic gathers want int8,
    the CPU interpreter wants a wide index type)."""
    W = x.shape[0]
    assert x.shape == (W, 8, _LANES) and pos.shape == x.shape
    g = min(group, W)
    while W % g:
        g -= 1
    grid = (W // g,)
    spec = lambda: pl.BlockSpec((g, 8, _LANES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_wperm_kernel, group=g),
        grid=grid,
        in_specs=[spec(), spec(), spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(pos, chk, rte, x)
