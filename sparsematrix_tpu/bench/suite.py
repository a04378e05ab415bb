"""Benchmark suite covering the BASELINE.json configs.

1. csr_spmv        — CSR SpMV sweep (random + banded, nnz/row 4–128)
2. spmm_csr        — CSR × dense RHS, k = 32/128/512 (jnp + densify paths)
3. spmm_bell       — blocked-ELL MXU Pallas path
4. bsr             — BSR SpMV/SpMM
5. codebook_gemm   — the reference's own headline workload:
                     C = A(117×2047) @ B(2047×1023), B codebook-sparse 25%
                     (m,n,k defaults from blas_test.cc:32; baseline 7.5 ms
                     on AVX2, kernel.cc:381)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import CSR, CodebookCSR, csr_to_blocked_ell, csr_to_bsr
from ..ops import (add_mat_mat, spmm, spmm_densify, spmm_reference, spmv,
                   spmv_reference)
from ..utils.roofline import speed_of_light_nnz_s, spmm_bytes, spmv_csr_bytes
from ..utils.testutils import (
    gen_matrix_random,
    gen_random_dense_sparse,
    gen_sparse_index_matrix,
    relative_check,
)
from ..utils.timer import bench_chain_slope, bench_fn_slope
from .harness import BenchRegistry, Row

registry = BenchRegistry()

REF_M, REF_N, REF_K = 117, 1023, 2047  # blas_test.cc:32 defaults
REF_BASELINE_MS = 7.5  # kernel.cc:381 (x86 AVX2 path)


def _mxu_precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _dense_race_row(tag, dense_np, rhs, nnz):
    """The on-chip dense baseline the reference harness always races
    against (blas_test.cc:41 → cblas_sgemm_baseline): same shape, plain
    jnp.dot on the MXU.  nnz/s here is *effective* (sparse-equivalent
    work per second) so rows are directly comparable."""
    dd = jnp.asarray(dense_np)
    f = jax.jit(lambda m, v: jnp.dot(m, v, precision=_mxu_precision(m.dtype)))
    res = bench_fn_slope(f, dd, rhs, iters=6, perturb_max_bytes=1 << 20)
    n, m = dense_np.shape
    # include the RHS width so per-k races stay distinct rows in merges
    k_str = f",k={rhs.shape[1]}" if rhs.ndim == 2 else ""
    r = Row(f"{tag}/dense-race", f"{n}x{m}{k_str} dense on-MXU", res,
            nnz=nnz)
    r.sol_frac = None  # roofline basis differs; Gnnz/s column is the race
    return r


@registry.register("calibrate")
def bench_calibrate(check=True, **kw):
    """Session-calibration rows: a fixed MXU matmul and a fixed HBM
    stream.  Identical artifacts measure up to ~2.4× apart between relay
    sessions (host-latency noise through the tunnel); these two constants
    let any two result JSONs be normalized against each other — divide a
    kernel row by its session's calibration row before comparing.

    Timed as self-dependent chains (``bench_chain_slope``): `_looped`'s
    additive-scalar perturbation is algebraically removable for a matmul
    (XLA distributes ``dot(a+ε, a+ε)``), which collapsed the first
    attempt at these rows to ~1 ns.
    """
    from ..utils.timer import bench_chain_slope

    rows = []
    rng0 = np.random.default_rng(0)
    d = jnp.asarray(rng0.uniform(-1, 1, (2048, 2048)).astype(np.float32))
    for tag, mm in (("fp32", d), ("bf16", d.astype(jnp.bfloat16))):
        prec = _mxu_precision(mm.dtype)
        scale = mm.dtype.type(2.0 ** -11)  # keep the chain O(1)

        def step(y, _a=mm, _p=prec, _s=scale):
            return jnp.dot(y, _a, precision=_p) * _s

        res = bench_chain_slope(step, mm, iters=6)
        r = Row(f"calibrate/matmul-{tag}", "2048^3 chained", res,
                nnz=2 * 2048**3)  # nnz/s column reads as FLOP/s
        r.sol_frac = None
        tflops = 2 * 2048**3 / (res.min_ms * 1e-3) / 1e12
        # spec cap: a calibration row above the silicon's spec sheet is a
        # timing artifact (slope endpoint noise can DEFLATE timings), not
        # data — flag unreliable so the registry drops it
        from ..utils.roofline import active_chip

        spec = (active_chip().bf16_tflops if tag == "bf16"
                else active_chip().fp32_tflops)
        if tflops > spec * 1.05:
            res.extras["unreliable"] = True
        r.extras = {"tflops": tflops, **res.extras}
        rows.append(r)
    # HBM stream via a PALLAS copy chain: plain-XLA elementwise programs
    # mis-time through the relay (both `y*c` and `abs(y)*c+d` chains
    # report impossible TB/s — the fori_loop collapses or readiness lies),
    # while pallas calls and matmul chains time linearly and consistently.
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BR, STEPS = 2048, 128  # 1 MB blocks × 128 = 128 MB
    copy_call = pl.pallas_call(
        lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:]),
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((BR, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BR * STEPS, 128), jnp.float32),
    )
    big = jnp.asarray(rng0.standard_normal((BR * STEPS, 128)), jnp.float32)
    res = bench_chain_slope(lambda y: copy_call(y), big, iters=6)
    r = Row("calibrate/hbm-stream", "128MB pallas copy chained", res,
            nnz=big.size)
    r.sol_frac = None
    gbps = 2 * big.size * 4 / (res.min_ms * 1e-3) / 1e9
    from ..utils.roofline import active_chip

    if gbps > active_chip().hbm_gbps * 1.05:  # same spec cap as matmul rows
        res.extras["unreliable"] = True
    r.extras = {"gb_per_s": gbps, **res.extras}
    rows.append(r)
    return rows


def _banded(rng, n, bandwidth):
    dense = np.zeros((n, n), dtype=np.float32)
    for off in range(-bandwidth // 2, bandwidth // 2 + 1):
        idx = np.arange(max(0, -off), min(n, n - off))
        dense[idx, idx + off] = rng.uniform(-1, 1, idx.shape[0])
    return dense


@registry.register("csr_spmv")
def bench_csr_spmv(check=True, sizes=(4096,), **kw):
    rng = np.random.default_rng(0)
    rows = []
    for n in sizes:
        for nnz_row in (4, 16, 64, 128):
            density = nnz_row / n
            dense = gen_random_dense_sparse(rng, n, n, density=density)
            A = CSR.fromdense(dense)
            x = jnp.asarray(gen_matrix_random(rng, n, 1)[:, 0])
            f = jax.jit(lambda a, v: spmv(a, v))
            res = bench_fn_slope(f, A, x, iters=6)
            checked = None
            if check:
                checked = relative_check(np.asarray(f(A, x)), dense @ np.asarray(x))
            sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
            r = Row("csr_spmv/random", f"n={n},nnz/row={nnz_row}", res,
                    nnz=A.nnz, checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            rows.append(r)
        # encode-once convention: jit closes over the CONCRETE container,
        # so the auto-pack dispatch engages (the reference's one-call
        # contract, sparse-matrix.cc:140 — no user-side packing)
        dense = gen_random_dense_sparse(rng, n, n, density=128 / n)
        A = CSR.fromdense(dense)
        x = jnp.asarray(gen_matrix_random(rng, n, 1)[:, 0])
        fa = jax.jit(lambda v: spmv(A, v))
        res = bench_fn_slope(fa, x, iters=6)
        checked = None
        if check:
            checked = relative_check(np.asarray(fa(x)), dense @ np.asarray(x))
        sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
        r = Row("csr_spmv/auto", f"n={n},nnz/row=128 (auto-pack dispatch)",
                res, nnz=A.nnz, checked=checked)
        r.sol_frac = r.nnz_per_s / sol
        rows.append(r)
        # SELL pallas kernel rows (the packed fast paths)
        from ..kernels.spmv_pallas import (
            pack_sell,
            pack_sell_rowpure,
            spmv_sell,
            spmv_sell_rowpure,
        )

        for nnz_row, tr in ((128, 64),):
            dense = gen_random_dense_sparse(rng, n, n, density=nnz_row / n)
            A = CSR.fromdense(dense)
            packed = pack_sell(A, tr=tr)
            x = jnp.asarray(gen_matrix_random(rng, n, 1)[:, 0])
            f = jax.jit(lambda p, v: spmv_sell(p, v))
            res = bench_fn_slope(f, packed, x, iters=6, perturb_max_bytes=1 << 20)
            checked = (
                relative_check(np.asarray(f(packed, x)), dense @ np.asarray(x))
                if check
                else None
            )
            sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
            r = Row("csr_spmv/sell-pallas",
                    f"n={n},nnz/row={nnz_row},tr={tr},fill={packed.fill_rate:.2f}",
                    res, nnz=A.nnz, checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            rows.append(r)
        for nnz_row, R in ((64, 16), (128, 8)):
            dense = gen_random_dense_sparse(rng, n, n, density=nnz_row / n)
            A = CSR.fromdense(dense)
            packed = pack_sell_rowpure(A, group=4, rows_per_sublane=R)
            x = jnp.asarray(gen_matrix_random(rng, n, 1)[:, 0])
            f = jax.jit(lambda p, v: spmv_sell_rowpure(p, v))
            res = bench_fn_slope(f, packed, x, iters=6, perturb_max_bytes=1 << 20)
            checked = (
                relative_check(np.asarray(f(packed, x)), dense @ np.asarray(x))
                if check
                else None
            )
            sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
            r = Row("csr_spmv/rowpure-pallas",
                    f"n={n},nnz/row={nnz_row},R={R},fill={packed.fill_rate:.2f}",
                    res, nnz=A.nnz, checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            rows.append(r)
        # row-lane kernel (the round-2 default fast path: auto-pack)
        from ..kernels.spmv_rowlane import pack_sell_rowlane, spmv_sell_rowlane

        for nnz_row in (64, 128):
            dense = gen_random_dense_sparse(rng, n, n, density=nnz_row / n)
            A = CSR.fromdense(dense)
            packed = pack_sell_rowlane(A)
            x = jnp.asarray(gen_matrix_random(rng, n, 1)[:, 0])
            f = jax.jit(lambda p, v: spmv_sell_rowlane(p, v))
            res = bench_fn_slope(f, packed, x, iters=6, perturb_max_bytes=1 << 20)
            checked = (
                relative_check(np.asarray(f(packed, x)), dense @ np.asarray(x))
                if check else None
            )
            sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
            r = Row("csr_spmv/rowlane-pallas",
                    f"n={n},nnz/row={nnz_row},g={packed.group},"
                    f"fill={packed.fill_rate:.2f}",
                    res, nnz=A.nnz, checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            rows.append(r)
        # on-chip dense race at the densest config
        rows.append(_dense_race_row("csr_spmv", dense, x, A.nnz))
        for bw in (9, 65):
            dense = _banded(rng, n, bw)
            A = CSR.fromdense(dense)
            x = jnp.asarray(gen_matrix_random(rng, n, 1)[:, 0])
            f = jax.jit(lambda a, v: spmv(a, v))
            res = bench_fn_slope(f, A, x, iters=6)
            checked = (
                relative_check(np.asarray(f(A, x)), dense @ np.asarray(x))
                if check
                else None
            )
            sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
            r = Row("csr_spmv/banded", f"n={n},band={bw}", res, nnz=A.nnz,
                    checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            rows.append(r)
            # the band-local layout: strip-dense batched matvec on the MXU
            from ..formats import StripDense

            S = StripDense.from_csr(A)
            fs = jax.jit(spmv_reference)
            res = bench_fn_slope(fs, S, x, iters=6, perturb_max_bytes=1 << 20)
            checked = (
                relative_check(np.asarray(fs(S, x)), dense @ np.asarray(x))
                if check
                else None
            )
            sol = speed_of_light_nnz_s(
                A.nnz, spmv_csr_bytes(S.strips.size, n, n, idx_bytes=0))
            r = Row("csr_spmv/banded-strip",
                    f"n={n},band={bw},width={S.width}", res, nnz=A.nnz,
                    checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            rows.append(r)
    return rows


@registry.register("csr_spmv_large")
def bench_csr_spmv_large(check=True, n=8192, nnz_row=256, **kw):
    """The north-star scale point: ≥2 M nnz, row-lane kernel fp32 + bf16,
    raced against the on-chip dense matvec."""
    from ..kernels.spmv_rowlane import pack_sell_rowlane, spmv_sell_rowlane

    rng = np.random.default_rng(7)
    dense = gen_random_dense_sparse(rng, n, n, density=nnz_row / n)
    A = CSR.fromdense(dense)
    x = jnp.asarray(gen_matrix_random(rng, n, 1)[:, 0])
    rows = []
    for dt, tag in ((None, "fp32"), (jnp.bfloat16, "bf16")):
        packed = pack_sell_rowlane(A, dtype=dt)
        # honest oracle per dtype: a bf16-stored matrix is checked against
        # the bf16-rounded values (its storage contract), in fp64
        dref = (dense if dt is None
                else np.asarray(jnp.asarray(dense).astype(dt)).astype(np.float64))
        want = dref.astype(np.float64) @ np.asarray(x)
        f = jax.jit(lambda p, v: spmv_sell_rowlane(p, v))
        # VALUE CHAIN (y ← A·y rescaled): `_looped` perturbation rewrites
        # the ~26 MB vals plane every iteration, overstating the kernel
        # (same artifact as csr_spmv_xl, measured 2.5× there)
        chain_scale = jnp.float32(2.0 ** -16)
        res = bench_chain_slope(
            lambda y, p_: f(p_, y) * chain_scale, x, packed, iters=6)
        checked = (relative_check(np.asarray(f(packed, x)), want)
                   if check else None)
        sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
        r = Row(f"csr_spmv_large/rowlane-{tag}",
                f"n={n},nnz/row={nnz_row},g={packed.group},"
                f"fill={packed.fill_rate:.2f}",
                res, nnz=A.nnz, checked=checked)
        r.sol_frac = r.nnz_per_s / sol
        from ..utils.roofline import active_chip

        slab_bytes = (packed.vals.size * packed.vals.dtype.itemsize
                      + packed.s_idx.size)
        r.extras = {"bw_util": slab_bytes / (res.min_ms * 1e-3) / 1e9
                    / active_chip().hbm_gbps, **res.extras}
        rows.append(r)
    # NOTE: no dual-gather rows here ON PURPOSE.  At this size the
    # dual-gather pack (7-15 MB) fits VMEM, so value-chain timing measures
    # warm-resident throughput (observed 145 Gnnz/s = 142 % SoL fp32 —
    # physically impossible as an HBM-cold number; the fp32 row then
    # drops below the slope jitter floor entirely).  The XL group
    # (150+ MB packs, cannot stay resident) is the honest scale point for
    # the dual-gather layout; the rowlane rows here remain comparable to
    # their round-1/2 history.
    rows.append(_dense_race_row("csr_spmv_large", dense, x, A.nnz))
    return rows


@registry.register("spmm_csr")
def bench_spmm_csr(check=True, n=2048, density=0.05, ks=(32, 128, 512), **kw):
    from ..formats import Dense

    rng = np.random.default_rng(1)
    dense = gen_random_dense_sparse(rng, n, n, density=density)
    A = CSR.fromdense(dense)
    D = Dense.from_sparse(A)  # build-time materialization (dense regime)
    # round-4 quantized pre-dense containers: bf16 halves the dominant A
    # plane AND swaps the multi-pass fp32 MXU for the native systolic
    # path; int8 halves it again on the integer MXU (the reference's own
    # codebook-quantization trade, blas_test.h:139-145, generalized via
    # per-row scales).  Checked against the fp64 oracle with the
    # reference's 0.1 relative policy — measured error ~1e-2 / ~4e-3.
    from ..formats import QuantDense

    Dbf = Dense.from_sparse(A, dtype=jnp.bfloat16)
    Q = QuantDense.from_sparse(A)
    rows = []
    for k in ks:
        X = jnp.asarray(gen_matrix_random(rng, n, k))
        for label, f, op in (
            ("spmm_csr/segsum", jax.jit(functools.partial(spmm_reference)), A),
            ("spmm_csr/densify", jax.jit(functools.partial(spmm_densify)), A),
            ("spmm_csr/pre-dense", jax.jit(lambda a, x: spmm(a, x)), D),
            ("spmm_csr/pre-dense-bf16", jax.jit(lambda a, x: spmm(a, x)), Dbf),
            ("spmm_csr/pre-dense-int8", jax.jit(lambda a, x: spmm(a, x)), Q),
        ):
            res = bench_fn_slope(f, op, X, iters=6)
            checked = None
            if check:
                got = np.asarray(f(op, X))
                want = dense.astype(np.float64) @ np.asarray(X)
                if label.endswith(("bf16", "int8")):
                    # quantized paths: error is ~1e-2 of the OUTPUT SCALE
                    # (operand rounding) — scale-floored policy, same as
                    # the codebook group's bf16/int8 checks
                    from ..utils.testutils import quantized_check

                    checked = quantized_check(
                        got, want,
                        med_tol=0.04 if label.endswith("int8") else 0.02,
                        q99_tol=0.2 if label.endswith("int8") else 0.1)
                else:
                    checked = relative_check(got, want)
            sol = speed_of_light_nnz_s(A.nnz, spmm_bytes(A.nnz, n, n, k))
            r = Row(label, f"n={n},k={k},d={density}", res, nnz=A.nnz,
                    checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            rows.append(r)
        if k <= 64:
            # low-density multi-RHS kernel (slab walk per column)
            from ..kernels.spmm_rowlane import spmm_rowlane
            from ..kernels.spmv_rowlane import pack_sell_rowlane

            packed = pack_sell_rowlane(A)
            fr = jax.jit(lambda p, x: spmm_rowlane(p, x))
            res = bench_fn_slope(fr, packed, X, iters=6, perturb_max_bytes=1 << 20)
            checked = None
            if check:
                checked = relative_check(
                    np.asarray(fr(packed, X)),
                    dense.astype(np.float64) @ np.asarray(X))
            sol = speed_of_light_nnz_s(A.nnz, spmm_bytes(A.nnz, n, n, k))
            r = Row("spmm_csr/rowlane", f"n={n},k={k},d={density}", res,
                    nnz=A.nnz, checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            rows.append(r)
            # the round-3 walk: dual-gather slabs at ~2x the fill
            # (measured 2.2x the rowlane walk at n=8192 d=0.01 k=32)
            from ..kernels.spmm_dualgather import spmm_dualgather
            from ..kernels.spmv_dualgather import pack_dualgather

            dpk = pack_dualgather(A, k_tiles=1)
            fd = jax.jit(lambda p, x: spmm_dualgather(p, x))
            res = bench_fn_slope(fd, dpk, X, iters=6,
                                 perturb_max_bytes=1 << 20)
            checked = None
            if check:
                checked = relative_check(
                    np.asarray(fd(dpk, X)),
                    dense.astype(np.float64) @ np.asarray(X))
            r = Row("spmm_csr/dualgather-walk", f"n={n},k={k},d={density}",
                    res, nnz=A.nnz, checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            rows.append(r)
        rows.append(_dense_race_row("spmm_csr", dense, X, A.nnz))
    return rows


@registry.register("spmm_bell")
def bench_spmm_bell(check=True, n=2048, density=0.05, ks=(128, 512), **kw):
    """Blocked-ELL on two inputs: unstructured sparsity forced into (8,128)
    blocks (the round-1 layout-mismatch case, kept for honesty) and
    BLOCK-STRUCTURED sparsity at the MXU-native (128,128) block shape —
    every stored block is a full systolic tile (the fair fight)."""
    from ..kernels.spmm_pallas import spmm_blocked_ell

    rng = np.random.default_rng(2)
    rows = []

    # (a) unstructured → (8,128) blocks: ~99% block padding, layout mismatch
    dense_u = gen_random_dense_sparse(rng, n, n, density=density)
    bell_u = csr_to_blocked_ell(CSR.fromdense(dense_u), block_shape=(8, 128))
    # (b) block-structured → (128,128) blocks, density of BLOCK slots
    bm = bk = 128
    mask = rng.random((n // bm, n // bk)) < density
    dense_b = (np.kron(mask, np.ones((bm, bk))).astype(np.float32)
               * gen_matrix_random(rng, n, n))
    bell_b = csr_to_blocked_ell(CSR.fromdense(dense_b),
                                block_shape=(bm, bk))
    for tag, dense, bell in (("unstructured-8x128", dense_u, bell_u),
                             ("blockstruct-128x128", dense_b, bell_b)):
        nnz = int((dense != 0).sum())
        for k in ks:
            X = jnp.asarray(gen_matrix_random(rng, n, k))
            f = jax.jit(spmm_blocked_ell)
            res = bench_fn_slope(f, bell, X, iters=6, perturb_max_bytes=1 << 20)
            checked = None
            if check:
                checked = relative_check(
                    np.asarray(f(bell, X)),
                    dense.astype(np.float64) @ np.asarray(X))
            # roofline accounts the padded blocks actually streamed
            bbm, bbk = bell.block_shape
            eff_nnz = bell.num_block_rows * bell.max_blocks_per_row * bbm * bbk
            sol = speed_of_light_nnz_s(
                nnz, spmm_bytes(eff_nnz, n, n, k, idx_bytes=0))
            r = Row(f"spmm_bell/{tag}", f"n={n},k={k},d={density}", res,
                    nnz=nnz, checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            rows.append(r)
        # race each input against plain dense on the MXU
        rows.append(_dense_race_row(f"spmm_bell/{tag}", dense, X, nnz))
    return rows


@registry.register("spmm_banded")
def bench_spmm_banded(check=True, n=4096, k=128, **kw):
    """Band-local structure (block-tridiagonal, the FEM/stencil shape):
    StripDense locally densifies each 128-row strip and batch-matmuls it
    on full MXU tiles, vs the (8,128) blocked-ELL kernel on the same
    matrix, vs the dense race.  (The round-1 review's "stack ≥16
    block-rows per grid step" MXU-occupancy ask, answered with a layout
    instead of a kernel.)"""
    from ..formats import StripDense

    rng = np.random.default_rng(12)
    bs = 128  # block size: block-tridiagonal -> strips span <= 3 blocks
    nb = n // bs
    mask = np.zeros((nb, nb), bool)
    for o in (-1, 0, 1):
        idx = np.arange(max(0, -o), nb - max(0, o))
        mask[idx, idx + o] = True
    dense = (np.kron(mask, np.ones((bs, bs))).astype(np.float32)
             * gen_matrix_random(rng, n, n))
    csr = CSR.fromdense(dense)
    nnz = csr.nnz
    S = StripDense.from_csr(csr)
    bell = csr_to_blocked_ell(csr, block_shape=(8, 128))
    X = jnp.asarray(gen_matrix_random(rng, n, k))
    x = jnp.asarray(gen_matrix_random(rng, n, 1)[:, 0])
    oracle = dense.astype(np.float64) @ np.asarray(X)
    rows = []

    from ..kernels.spmm_pallas import spmm_blocked_ell

    for tag, f, args, eff, idxb in (
        ("strip-spmm", jax.jit(spmm_reference), (S, X), S.strips.size, 0),
        ("bell-spmm", jax.jit(spmm_blocked_ell), (bell, X),
         bell.num_block_rows * bell.max_blocks_per_row * 8 * 128, 0),
    ):
        res = bench_fn_slope(f, *args, iters=6, perturb_max_bytes=1 << 20)
        checked = (relative_check(np.asarray(f(*args)), oracle)
                   if check else None)
        sol = speed_of_light_nnz_s(nnz, spmm_bytes(eff, n, n, k,
                                                   idx_bytes=idxb))
        r = Row(f"spmm_banded/{tag}",
                f"n={n},k={k},band=3x{bs},width={S.width}", res, nnz=nnz,
                checked=checked)
        r.sol_frac = r.nnz_per_s / sol
        rows.append(r)
    # spmv on the same structure (strip matvec vs auto-packed CSR kernel)
    fv = jax.jit(spmv_reference)
    res = bench_fn_slope(fv, S, x, iters=6, perturb_max_bytes=1 << 20)
    checked = (relative_check(np.asarray(fv(S, x)),
                              dense.astype(np.float64) @ np.asarray(x))
               if check else None)
    sol = speed_of_light_nnz_s(
        nnz, spmv_csr_bytes(S.strips.size, n, n, idx_bytes=0))
    r = Row("spmm_banded/strip-spmv", f"n={n},band=3x{bs},width={S.width}",
            res, nnz=nnz, checked=checked)
    r.sol_frac = r.nnz_per_s / sol
    rows.append(r)
    rows.append(_dense_race_row("spmm_banded", dense, X, nnz))
    return rows


@registry.register("bsr")
def bench_bsr(check=True, n=2048, block=(8, 8), density=0.05, k=128, **kw):
    rng = np.random.default_rng(3)
    # block-structured sparsity: dense blocks at `density` of block slots
    nb = n // block[0]
    mask = rng.random((nb, n // block[1])) < density
    dense = (
        np.kron(mask, np.ones(block)).astype(np.float32)
        * gen_matrix_random(rng, n, n)
    )
    A = csr_to_bsr(CSR.fromdense(dense), block_shape=block)
    x = jnp.asarray(gen_matrix_random(rng, n, 1)[:, 0])
    X = jnp.asarray(gen_matrix_random(rng, n, k))
    rows = []
    # encode-once convention: close over the CONCRETE container so the
    # build-time conversion caches engage (a traced A defeats them — the
    # r4 pass-E lesson: 8.2 vs ~50 Gnnz/s for the routed spmv)
    f1 = jax.jit(lambda v: spmv(A, v))
    res = bench_fn_slope(f1, x, iters=6, perturb_max_bytes=1 << 20)
    chk = relative_check(np.asarray(f1(x)), dense @ np.asarray(x)) if check else None
    sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n, idx_bytes=4 / (block[0] * block[1])))
    r = Row("bsr/spmv", f"n={n},b={block},d={density}", res, nnz=A.nnz, checked=chk)
    r.sol_frac = r.nnz_per_s / sol
    rows.append(r)
    f2 = jax.jit(lambda a, m: spmm(a, m, method="sparse"))
    res = bench_fn_slope(f2, A, X, iters=6, perturb_max_bytes=1 << 20)
    chk = (
        relative_check(np.asarray(f2(A, X)), dense.astype(np.float64) @ np.asarray(X))
        if check
        else None
    )
    sol = speed_of_light_nnz_s(A.nnz, spmm_bytes(A.nnz, n, n, k, idx_bytes=0))
    r = Row("bsr/spmm", f"n={n},b={block},k={k}", res, nnz=A.nnz, checked=chk)
    r.sol_frac = r.nnz_per_s / sol
    rows.append(r)
    # zero-hint auto dispatch: small dense-enough blocks reroute to the
    # dense MXU contraction (the measured-best path for this regime)
    f2a = jax.jit(lambda m: spmm(A, m, method="auto"))
    res = bench_fn_slope(f2a, X, iters=6, perturb_max_bytes=1 << 20)
    chk = (
        relative_check(np.asarray(f2a(X)),
                       dense.astype(np.float64) @ np.asarray(X))
        if check
        else None
    )
    r = Row("bsr/spmm-auto", f"n={n},b={block},k={k}", res, nnz=A.nnz,
            checked=chk)
    r.sol_frac = r.nnz_per_s / sol
    rows.append(r)
    # encode-once convention (closure over the container, like codebook):
    # the concrete BSR auto-packs the panel layout — one wide MXU dot per
    # block-row instead of one 8x8 dot per stored block
    f3 = jax.jit(lambda m: spmm(A, m, method="sparse"))
    res = bench_fn_slope(f3, X, iters=6, perturb_max_bytes=1 << 20)
    chk = (
        relative_check(np.asarray(f3(X)),
                       dense.astype(np.float64) @ np.asarray(X))
        if check
        else None
    )
    r = Row("bsr/spmm-panel", f"n={n},b={block},k={k}", res, nnz=A.nnz,
            checked=chk)
    r.sol_frac = r.nnz_per_s / sol
    rows.append(r)
    return rows


@registry.register("csr_spmv_xl")
def bench_csr_spmv_xl(check=True, n=32768, nnz_row=512, **kw):
    """The 10⁷-nnz scale point (north star: 10⁷–10⁸ nnz): built sparse
    end-to-end (no dense temporaries), oracle via scipy."""
    import time

    import scipy.sparse as sps

    from ..kernels.spmv_rowlane import pack_sell_rowlane, spmv_sell_rowlane

    # direct generation (scipy.sparse.random's no-replacement sampler is
    # pathologically slow at 10^7+ nnz): fixed draws per row, duplicates
    # merged by the COO→CSR conversion
    g = np.random.default_rng(9)
    rows_ = np.repeat(np.arange(n), nnz_row)
    cols_ = g.integers(0, n, n * nnz_row)
    data_ = g.uniform(-1000, 1000, n * nnz_row).astype(np.float32)
    sp = sps.coo_matrix((data_, (rows_, cols_)), shape=(n, n)).tocsr()
    sp.sum_duplicates()
    A = CSR.from_scipy(sp)
    rng = np.random.default_rng(9)
    x = rng.standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)
    want = sp.astype(np.float64) @ x if check else None
    # bf16 oracle: the bf16-ROUNDED stored values in fp64 (the storage
    # contract, same policy as csr_spmv_large)
    want_bf16 = None
    if check:
        spq = sp.copy()
        spq.data = np.asarray(jnp.asarray(sp.data).astype(jnp.bfloat16)
                              ).astype(np.float64)
        want_bf16 = spq @ x
    sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
    f = jax.jit(lambda p, v: spmv_sell_rowlane(p, v))
    rows = []
    # timing: VALUE CHAIN (y ← A·y, rescaled).  `_looped`-style slope
    # timing perturbs EVERY float leaf per iteration — at 16.6 M nnz that
    # rewrites the ~280 MB vals array each step, overstating the kernel
    # 2.5× (measured 1.41 ms looped vs 0.55 ms chained, same pack)
    chain_scale = jnp.float32(2.0 ** -20)
    # group=256 measured best (probe_xl_chain: fp32 91.6% HBM util vs
    # 79.7% at g128; bf16 42.3 Gnnz/s).  sp4 variants dropped: measured a
    # wash (tail theorem, DESIGN.md).
    for tag, kws in (("fp32", dict(group=256)),
                     ("bf16", dict(group=256, dtype=jnp.bfloat16))):
        t0 = time.time()
        packed = pack_sell_rowlane(A, **kws)
        pack_s = time.time() - t0
        res = bench_chain_slope(
            lambda y, p_: f(p_, y) * chain_scale, xj, packed, iters=6)
        checked = None
        if check:
            # bf16 rows judge against the bf16-ROUNDED oracle (the
            # storage contract; accumulation stays fp32)
            checked = relative_check(
                np.asarray(f(packed, xj)),
                want_bf16 if kws.get("dtype") is not None else want)
        r = Row(f"csr_spmv_xl/rowlane-{tag}",
                f"n={n},nnz={A.nnz/1e6:.1f}M,g={packed.group},"
                f"fill={packed.fill_rate:.2f}",
                res, nnz=A.nnz, checked=checked)
        r.sol_frac = r.nnz_per_s / sol
        # honest split of the SoL gap: kernel HBM utilization (actual slab
        # bytes streamed / time / spec bandwidth) vs the packing fill,
        # which is structural for uniform-random patterns (DESIGN.md)
        slab_bytes = (packed.vals.size * packed.vals.dtype.itemsize
                      + packed.s_idx.size)
        from ..utils.roofline import active_chip

        r.extras = {"pack_seconds": pack_s,
                    "bw_util": slab_bytes / (res.min_ms * 1e-3) / 1e9
                    / active_chip().hbm_gbps,
                    **res.extras}
        rows.append(r)
    # dual-gather superblock: the measured-best unstructured layout.
    # Round-4 fp32 config: TWO-WINDOW slabs (matched window pairing +
    # 4-bit idxA) on 8-tile superblocks — 75.0 Gnnz/s (73.4 % SoL) vs
    # 67.7 single-window kt32 (probe_dualgather_xl5); bf16 keeps the r3
    # g512/kt32 single-window config (its kernel is gather-bound, so the
    # two-window ops cost more than the fill gain buys).
    from ..kernels.spmv_dualgather import pack_dualgather, spmv_dualgather

    fdg = jax.jit(lambda p, v: spmv_dualgather(p, v))
    for tag, pack_kw in (
            ("fp32", dict(group=128, k_tiles=8, two_win=True)),
            ("bf16", dict(group=512, k_tiles=32, dtype=jnp.bfloat16))):
        t0 = time.time()
        packed = pack_dualgather(A, **pack_kw)
        dg_pack_s = time.time() - t0
        res = bench_chain_slope(
            lambda y, p_: fdg(p_, y) * chain_scale, xj, packed, iters=6)
        checked = None
        if check:
            checked = relative_check(
                np.asarray(fdg(packed, xj)),
                want_bf16 if tag == "bf16" else want)
        r = Row(f"csr_spmv_xl/dualgather-{tag}",
                f"n={n},nnz={A.nnz/1e6:.1f}M,g={packed.group},"
                f"kt={packed.k_tiles},tw={int(packed.two_win)},"
                f"fill={packed.fill_rate:.2f}",
                res, nnz=A.nnz, checked=checked)
        nb = packed.vals.dtype.itemsize
        sol_dg = speed_of_light_nnz_s(
            A.nnz, spmv_csr_bytes(A.nnz, n, n, val_bytes=nb))
        r.sol_frac = r.nnz_per_s / sol_dg
        slab_bytes = (packed.vals.size * nb + packed.idxA.size
                      + packed.idxB.size)
        r.extras = {"pack_seconds": dg_pack_s,
                    "bw_util": slab_bytes / (res.min_ms * 1e-3) / 1e9
                    / active_chip().hbm_gbps,
                    **res.extras}
        rows.append(r)
    return rows


def gen_zipf_csr(seed, n, m, total_nnz, alpha=0.8, col_zipf=False):
    """Power-law structure generator (the SURVEY §7 'honest roofline'
    gap: every uniform-Poisson fill claim assumes i.i.d. rows).

    Row degrees follow a rank-α power law ``deg_i ∝ (i+1)^-α`` shuffled
    over rows (α=0.8 ≈ web/social-graph out-degree); ``col_zipf`` draws
    column targets from the same law (hub columns), else uniform.
    Duplicates merge, so the realized nnz is slightly under
    ``total_nnz``."""
    import scipy.sparse as sps

    g = np.random.default_rng(seed)
    w = (np.arange(n) + 1.0) ** (-alpha)
    deg = np.maximum(1, np.round(w * (total_nnz / w.sum()))).astype(
        np.int64)
    g.shuffle(deg)
    rows_ = np.repeat(np.arange(n), deg)
    if col_zipf:
        wc = (np.arange(m) + 1.0) ** (-alpha)
        cols_ = g.choice(m, size=rows_.size, p=wc / wc.sum())
    else:
        cols_ = g.integers(0, m, rows_.size)
    data_ = g.uniform(-1000, 1000, rows_.size).astype(np.float32)
    sp = sps.coo_matrix((data_, (rows_, cols_)), shape=(n, m)).tocsr()
    sp.sum_duplicates()
    return sp


@registry.register("spmv_clustered")
def bench_spmv_clustered(check=True, n=512 * 128, nnz=80_000, **kw):
    """The routing-contract point (VERDICT r4 §1): clustered low-degree
    structure — 512 row tiles whose ~1.2 entries/row all land in ONE
    1024-column window (tests/test_spmv_superblock's generator).  Races
    the octet pack against the two-window dual-gather so the
    ``prepare_spmv`` auto rule (ops/spmv.py: nnz ≤ 2·rows → octet) stays
    pinned to a measured winner.  Probe result (r5,
    benchmarks/probe_route_clustered.py): octet 13.5 µs vs dual-gather
    18.4 µs."""
    import time

    import scipy.sparse as sps

    from ..kernels.spmv_dualgather import pack_dualgather, spmv_dualgather
    from ..kernels.spmv_octet import pack_octet, spmv_octet

    g = np.random.default_rng(0)
    rows_ = g.integers(0, n, size=nnz)
    cols_ = g.integers(0, 1024, size=nnz)
    vals_ = g.uniform(-1000, 1000, nnz).astype(np.float32)
    sp = sps.coo_matrix((vals_, (rows_, cols_)), shape=(n, n)).tocsr()
    sp.sum_duplicates()
    A = CSR.from_scipy(sp)
    x = g.standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)
    want = sp.astype(np.float64) @ x if check else None
    sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
    rows = []
    for tag, packer, run in (
            ("octet", lambda: pack_octet(A),
             jax.jit(lambda p, v: spmv_octet(p, v))),
            ("dualgather", lambda: pack_dualgather(A, k_tiles=8,
                                                   two_win=True),
             jax.jit(lambda p, v: spmv_dualgather(p, v)))):
        t0 = time.time()
        packed = packer()
        pack_s = time.time() - t0
        res = bench_fn_slope(run, packed, xj, iters=6)
        checked = (relative_check(np.asarray(run(packed, xj)), want)
                   if check else None)
        r = Row(f"spmv_clustered/{tag}",
                f"n={n},nnz={A.nnz},1win,fill={packed.fill_rate:.2f}",
                res, nnz=A.nnz, checked=checked)
        r.sol_frac = r.nnz_per_s / sol
        r.extras = {"pack_seconds": pack_s}
        rows.append(r)
    return rows


@registry.register("spmv_skew")
def bench_spmv_skew(check=True, n=32768, nnz_row=512, **kw):
    """SpMV on POWER-LAW structure (VERDICT r4 §6): same size/nnz budget
    as csr_spmv_xl but Zipf row degrees (max deg ~10⁵) and, in the
    second variant, Zipf column popularity (hub columns).  Measures
    whether the first-fit packers' fill and the auto-routing constants
    survive non-uniform degree distributions; compare directly with the
    csr_spmv_xl rows."""
    import time

    from ..kernels.spmv_dualgather import pack_dualgather, spmv_dualgather

    from ..ops.spmv import prepare_spmv, spmv as spmv_op

    fdg = jax.jit(lambda p, v: spmv_dualgather(p, v))
    fsk = jax.jit(lambda p, v: spmv_op(p, v))
    chain_scale = jnp.float32(2.0 ** -20)
    rows = []
    for tag, col_zipf in (("rowzipf", False), ("hubcols", True)):
        sp = gen_zipf_csr(9, n, n, n * nnz_row, col_zipf=col_zipf)
        A = CSR.from_scipy(sp)
        x = np.random.default_rng(9).standard_normal(n).astype(np.float32)
        xj = jnp.asarray(x)
        want = sp.astype(np.float64) @ x if check else None
        sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
        dmax = int(np.diff(sp.indptr).max())
        t0 = time.time()
        packed = pack_dualgather(A, group=128, k_tiles=8, two_win=True)
        pack_s = time.time() - t0
        res = bench_chain_slope(
            lambda y, p_: fdg(p_, y) * chain_scale, xj, packed, iters=6)
        checked = (relative_check(np.asarray(fdg(packed, xj)), want)
                   if check else None)
        r = Row(f"spmv_skew/dualgather-{tag}",
                f"n={n},nnz={A.nnz/1e6:.1f}M,degmax={dmax},"
                f"fill={packed.fill_rate:.2f}",
                res, nnz=A.nnz, checked=checked)
        r.sol_frac = r.nnz_per_s / sol
        r.extras = {"pack_seconds": pack_s, **res.extras}
        rows.append(r)
        # the round-5 fix: auto routes to the hybrid skew layout
        # (ops/skew.py — hub rows/cols dense-blocked, rest degree-sorted)
        t0 = time.time()
        sk = prepare_spmv(A)
        sk_pack_s = time.time() - t0
        from ..ops.skew import SkewSpmv

        res = bench_chain_slope(
            lambda y, p_: fsk(p_, y) * chain_scale, xj, sk, iters=6)
        checked = (relative_check(np.asarray(fsk(sk, xj)), want)
                   if check else None)
        hr = (int(sk.hub_rows.shape[0])
              if isinstance(sk, SkewSpmv) else 0)
        hc = (int(sk.hub_cols.shape[0])
              if isinstance(sk, SkewSpmv) else 0)
        r = Row(f"spmv_skew/auto-skew-{tag}",
                f"n={n},nnz={A.nnz/1e6:.1f}M,degmax={dmax},hub_r={hr},"
                f"hub_c={hc},fill={sk.fill_rate:.2f}",
                res, nnz=A.nnz, checked=checked)
        r.sol_frac = r.nnz_per_s / sol
        r.extras = {"pack_seconds": sk_pack_s, **res.extras}
        rows.append(r)
    return rows


@registry.register("spgemm_skew")
def bench_spgemm_skew(check=True, n=16384, density=0.001, **kw):
    """SpGEMM on power-law operands (VERDICT r4 §6): same nnz budget as
    spgemm_xl but Zipf row degrees on both A and B (cols uniform so the
    pair count stays comparable).  Exercises the octet packer's
    depth/slot first-fit under hub rows."""
    from ..ops.spgemm import spgemm_apply_packed_csc, spgemm_plan_packed

    import time

    total = int(n * n * density)
    sa = gen_zipf_csr(7, n, n, total)
    sb = gen_zipf_csr(8, n, n, total)
    A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
    want = None
    if check:
        want = (sa.astype(np.float64) @ sb.astype(np.float64)).T.tocsr()
        want.sort_indices()
    t0 = time.time()
    pp = spgemm_plan_packed(A, B, layout="octet")
    pack_s = time.time() - t0
    f = jax.jit(lambda q, bd: spgemm_apply_packed_csc(q, bd).data)
    got = np.asarray(f(pp, B.data))
    checked = (relative_check(got[: pp.c_nnz], want.data)
               if check else None)
    res = bench_fn_slope(f, pp, B.data, iters=6,
                         perturb_max_bytes=1 << 20)
    pairs = pp.p_packed.nnz
    sol_pairs = speed_of_light_nnz_s(
        pairs, pairs * (2 * 4 + 3 * 4) + pp.c_nnz * 4)
    r = Row("spgemm_skew/octet-csc",
            f"n={n},pairs={pairs},degmax={int(np.diff(sa.indptr).max())},"
            f"fill={pp.p_packed.fill_rate:.2f}",
            res, nnz=pairs, checked=checked)
    r.sol_frac = r.nnz_per_s / sol_pairs
    r.extras = {"pack_seconds": pack_s}
    return [r]


@registry.register("weak_scaling")
def bench_weak_scaling(check=True, **kw):
    """MODELED weak scaling (no multi-chip hardware in this environment):
    per-device collective bytes from the partition geometry
    (parallel/scaling.py, validated on the simulated mesh) + the measured
    single-chip rowlane throughput from this run when available."""
    from ..utils.timer import BenchResult
    from ..parallel.scaling import weak_scaling_table

    # calibrate the local-compute term to the fastest measured kernel in
    # this run: the dual-gather XL row when present (the auto-dispatch
    # layout the distributed SpMV actually inherits), else rowlane-large
    measured = None
    basis = "HBM roofline"
    for name in ("csr_spmv_xl/dualgather-fp32", "csr_spmv_large/rowlane-fp32"):
        for r in registry.rows:
            if r.name == name:
                measured = r.nnz_per_s / 1e9
                basis = f"measured single-chip {name.split('/')[1]}"
                break
        if measured is not None:
            break
    table = weak_scaling_table(8192, 256, ns=[1, 2, 4, 8],
                               measured_single_chip_gnnz=measured)
    rows = []
    for row in table:
        res = BenchResult(mean_ms=row["modeled_step_s"] * 1e3,
                          min_ms=row["modeled_step_s"] * 1e3,
                          compile_ms=0.0, iters=0,
                          extras={"modeled": True})
        r = Row(f"weak_scaling/modeled-{row['n_devices']}dev",
                f"rows={row['rows']},comm={row['comm_bytes_per_device']}B",
                res, nnz=row["nnz"])
        r.extras = {
            "weak_scaling_efficiency": row["weak_scaling_efficiency"],
            "modeled": True,
            "basis": basis,
        }
        rows.append(r)
    return rows


@registry.register("spgemm")
def bench_spgemm(check=True, n=2048, density=0.01, **kw):
    """SpGEMM symbolic (host, seconds) + numeric (device, pairs/s)."""
    import time

    from ..ops.spgemm import spgemm_apply, spgemm_plan

    rng = np.random.default_rng(5)
    da = gen_random_dense_sparse(rng, n, n, density=density)
    db = gen_random_dense_sparse(rng, n, n, density=density)
    A, B = CSR.fromdense(da), CSR.fromdense(db)
    t0 = time.time()
    plan = spgemm_plan(A, B)
    plan_s = time.time() - t0
    f = jax.jit(lambda p, ad, bd: spgemm_apply(p, ad, bd).data)
    res = bench_fn_slope(f, plan, A.data, B.data, iters=6)
    checked = None
    if check:
        got = np.asarray(f(plan, A.data, B.data))
        import scipy.sparse as sps

        want = (sps.csr_matrix(da.astype(np.float64))
                @ sps.csr_matrix(db.astype(np.float64))).tocsr()
        want.sort_indices()
        checked = relative_check(got[: plan.c_nnz], want.data)
    # traffic: read both operand data planes + pair indices, write C
    bytes_moved = plan.n_pairs * (2 * 4 + 3 * 4) + plan.c_nnz * 4
    sol = speed_of_light_nnz_s(plan.n_pairs, bytes_moved)
    r = Row("spgemm/numeric", f"n={n},d={density},pairs={plan.n_pairs}",
            res, nnz=plan.n_pairs, checked=checked)
    r.sol_frac = r.nnz_per_s / sol
    r.extras = {"plan_seconds": plan_s, "c_nnz": plan.c_nnz}
    rows = [r]
    # packed numeric phase: the pair program run as a row-lane SpMV
    import time as _time

    from ..ops.spgemm import spgemm_apply_packed, spgemm_plan_packed

    t0 = _time.time()
    pp = spgemm_plan_packed(A, B)
    pack_s = _time.time() - t0
    fp = jax.jit(lambda q, bd: spgemm_apply_packed(q, bd).data)
    res = bench_fn_slope(fp, pp, B.data, iters=6, perturb_max_bytes=1 << 20)
    checked = None
    if check:
        got = np.asarray(fp(pp, B.data))
        checked = relative_check(got[: pp.c_nnz], want.data)
    r2 = Row("spgemm/numeric-packed",
             f"n={n},d={density},pairs={plan.n_pairs},"
             f"fill={pp.p_packed.fill_rate:.2f}",
             res, nnz=plan.n_pairs, checked=checked)
    r2.sol_frac = r2.nnz_per_s / sol
    r2.extras = {"pack_seconds": pack_s}
    rows.append(r2)
    # CSC-native output (no c_nnz permutation — see spgemm_xl)
    from ..ops.spgemm import spgemm_apply_packed_csc

    fpc = jax.jit(lambda q, bd: spgemm_apply_packed_csc(q, bd).data)
    res = bench_fn_slope(fpc, pp, B.data, iters=6,
                         perturb_max_bytes=1 << 20)
    checked = None
    if check:
        wantT = want.T.tocsr()
        wantT.sort_indices()
        got = np.asarray(fpc(pp, B.data))
        checked = relative_check(got[: pp.c_nnz], wantT.data)
    r2c = Row("spgemm/numeric-packed-csc",
              f"n={n},d={density},pairs={plan.n_pairs},"
              f"fill={pp.p_packed.fill_rate:.2f}",
              res, nnz=plan.n_pairs, checked=checked)
    r2c.sol_frac = r2c.nnz_per_s / sol
    r2c.extras = {"pack_seconds": pack_s}
    rows.append(r2c)

    # density-adaptive MXU path: full dense product (+ optional pattern
    # extraction) — below the crossover the MXU's ~10^3x FLOP advantage
    # beats any gather-bound pair program
    from ..formats import Dense
    from ..ops.spgemm import spgemm_densify, spgemm_extract

    Ad, Bd = Dense.from_sparse(A), Dense.from_sparse(B)
    fd = jax.jit(lambda a, b: spgemm_densify(a, b).data)
    res = bench_fn_slope(fd, Ad, Bd, iters=6)
    checked = None
    if check:
        got = np.asarray(fd(Ad, Bd))
        wr, wc = want.nonzero()
        checked = relative_check(got[wr, wc], np.asarray(want[wr, wc]).ravel())
    r3 = Row("spgemm/densify-mxu", f"n={n},d={density},pairs={plan.n_pairs}",
             res, nnz=plan.n_pairs, checked=checked)
    r3.sol_frac = r3.nnz_per_s / sol
    rows.append(r3)

    fe = jax.jit(lambda a, b, p: spgemm_extract(p, spgemm_densify(a, b)).data)
    res = bench_fn_slope(fe, Ad, Bd, plan, iters=6)
    checked = None
    if check:
        got = np.asarray(fe(Ad, Bd, plan))
        checked = relative_check(got[: plan.c_nnz], want.data)
    r4 = Row("spgemm/densify-extract",
             f"n={n},d={density},pairs={plan.n_pairs}",
             res, nnz=plan.n_pairs, checked=checked)
    r4.sol_frac = r4.nnz_per_s / sol
    rows.append(r4)

    # distributed packed numeric phase on a 1-device mesh: proves the
    # shard_map composition (local superblock pair program + psum)
    # inherits the packed kernel's throughput before any scaling model
    # multiplies it out (parallel/dist_spgemm.py)
    from jax.sharding import Mesh as _Mesh

    from ..parallel.dist_spgemm import (dist_spgemm_packed_apply,
                                        dist_spgemm_packed_plan,
                                        shard_dist_spgemm_packed)

    t0 = _time.time()
    mesh1 = _Mesh(np.array(jax.devices()[:1]), ("shard",))
    dpp = shard_dist_spgemm_packed(
        dist_spgemm_packed_plan(A, B, 1), mesh1)
    dist_pack_s = _time.time() - t0
    fdp = jax.jit(lambda q, bd: dist_spgemm_packed_apply(
        q, mesh1, b_data=bd).data)
    res = bench_fn_slope(fdp, dpp, B.data, iters=6,
                         perturb_max_bytes=1 << 20)
    checked = None
    if check:
        got = np.asarray(fdp(dpp, B.data))
        checked = relative_check(got[: dpp.c_nnz], want.data)
    r5 = Row("spgemm/dist-packed-1shard",
             f"n={n},d={density},pairs={plan.n_pairs}",
             res, nnz=plan.n_pairs, checked=checked)
    r5.sol_frac = r5.nnz_per_s / sol
    r5.extras = {"pack_seconds": dist_pack_s}
    rows.append(r5)
    return rows


@registry.register("spgemm_xl")
def bench_spgemm_xl(check=True, n=16384, density=0.001, **kw):
    """SpGEMM at a scale where densify is off the table (n² dense product
    = 1 GB fp32) — the packed pair program is the only path, on the
    superblock kernel (clustered plans are ~1.7 slabs/tile → the
    per-tile rowlane kernel is grid-step-bound here)."""
    import time

    import scipy.sparse as sps

    from ..ops.spgemm import spgemm_apply_packed, spgemm_plan_packed

    rng = np.random.default_rng(7)
    sa = sps.random(n, n, density=density, random_state=7, format="csr",
                    dtype=np.float32)
    sb = sps.random(n, n, density=density, random_state=8, format="csr",
                    dtype=np.float32)
    sa.data = rng.uniform(-1000, 1000, sa.nnz).astype(np.float32)
    sb.data = rng.uniform(-1000, 1000, sb.nnz).astype(np.float32)
    A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
    rows = []
    want = None
    if check:
        want = (sa.astype(np.float64) @ sb.astype(np.float64)).tocsr()
        want.sort_indices()
    for label, layout in (("superblock", "superblock"),
                          ("octet", "octet"),
                          ("rowlane", "rowlane")):
        t0 = time.time()
        pp = spgemm_plan_packed(A, B, layout=layout)
        pack_s = time.time() - t0
        fp = jax.jit(lambda q, bd: spgemm_apply_packed(q, bd).data)
        res = bench_fn_slope(fp, pp, B.data, iters=6, perturb_max_bytes=1 << 20)
        checked = None
        if check:
            got = np.asarray(fp(pp, B.data))
            checked = relative_check(got[: pp.c_nnz], want.data)
        n_pairs = pp.p_packed.nnz
        bytes_moved = n_pairs * (2 * 4 + 3 * 4) + pp.c_nnz * 4
        sol = speed_of_light_nnz_s(n_pairs, bytes_moved)
        r = Row(f"spgemm_xl/{label}",
                f"n={n},d={density},pairs={n_pairs},"
                f"fill={pp.p_packed.fill_rate:.2f}",
                res, nnz=n_pairs, checked=checked)
        r.sol_frac = r.nnz_per_s / sol
        r.extras = {"pack_seconds": pack_s, "c_nnz": pp.c_nnz}
        rows.append(r)
        if label in ("superblock", "octet"):
            # CSC-native output (C^T as CSR — the reference's
            # CopyTo(trans) convention): skips the c_nnz-element output
            # permutation that dominates the CSR row (measured 10.1×:
            # 32.3 → 3.2 ms, probe_spgemm_xl.py — an arbitrary gather
            # costs ~6.7 ns/element on this hardware)
            from ..ops.spgemm import spgemm_apply_packed_csc

            fpc = jax.jit(lambda q, bd: spgemm_apply_packed_csc(q, bd).data)
            res = bench_fn_slope(fpc, pp, B.data, iters=6,
                                 perturb_max_bytes=1 << 20)
            checked = None
            if check:
                wantT = want.T.tocsr()
                wantT.sort_indices()
                got = np.asarray(fpc(pp, B.data))
                checked = relative_check(got[: pp.c_nnz], wantT.data)
            r = Row(f"spgemm_xl/{label}-csc",
                    f"n={n},d={density},pairs={n_pairs},"
                    f"fill={pp.p_packed.fill_rate:.2f}",
                    res, nnz=n_pairs, checked=checked)
            r.sol_frac = r.nnz_per_s / sol
            r.extras = {"pack_seconds": pack_s, "c_nnz": pp.c_nnz}
            rows.append(r)
    # dense race at XL: n² fp32 temporaries are 1 GB each but FIT — the
    # honest fight the sparse path must win here (2n³ = 8.8 TFLOP on the
    # MXU vs ~4.4M pairs through the pair program).  Steps are ~50-200 ms,
    # far above dispatch jitter, so min-of-3 direct timing is reliable.
    import time as _time

    for tag, dt in (("bf16", jnp.bfloat16), ("fp32", None)):
        ad = jnp.asarray(sa.toarray())
        bd = jnp.asarray(sb.toarray())
        if dt is not None:
            ad, bd = ad.astype(dt), bd.astype(dt)
        prec = (jax.lax.Precision.HIGHEST if dt is None
                else jax.lax.Precision.DEFAULT)
        fd = jax.jit(lambda a, b: jnp.dot(a, b, precision=prec))
        out = fd(ad, bd)
        out.block_until_ready()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            fd(ad, bd).block_until_ready()
            best = min(best, _time.perf_counter() - t0)
        from ..utils.timer import BenchResult

        res = BenchResult(mean_ms=best * 1e3, min_ms=best * 1e3,
                          compile_ms=0.0, iters=3, extras={})
        checked = None
        if check:
            # compare on C's sparse pattern (the dense zeros are trivial)
            got = np.asarray(fd(ad, bd)).astype(np.float64)
            checked = relative_check(got[want.nonzero()], want.data)
        r = Row(f"spgemm_xl/dense-race-{tag}", f"n={n},2n^3 MXU", res,
                nnz=n_pairs, checked=checked)
        r.sol_frac = None
        rows.append(r)
        del ad, bd
    return rows


@registry.register("spgemm_crossover")
def bench_spgemm_crossover(check=True, **kw):
    """Density-crossover study: best sparse numeric path vs densify across
    (n, d) points between the spgemm (n=2048) and spgemm_xl (n=16384)
    anchors.  The spgemm(method='auto') rule's constants come from these
    rows (ops/spgemm.py: _DENSE_FLOPS_PER_S / _PACKED_PAIRS_PER_S)."""
    import time

    import scipy.sparse as sps

    from ..ops.spgemm import (spgemm_apply_packed, spgemm_densify,
                              spgemm_plan_packed)

    rows = []
    for n, density in ((4096, 0.004), (8192, 0.002)):
        rng = np.random.default_rng(11)
        sa = sps.random(n, n, density=density, random_state=11,
                        format="csr", dtype=np.float32)
        sb = sps.random(n, n, density=density, random_state=12,
                        format="csr", dtype=np.float32)
        sa.data = rng.uniform(-1000, 1000, sa.nnz).astype(np.float32)
        sb.data = rng.uniform(-1000, 1000, sb.nnz).astype(np.float32)
        A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
        want = None
        if check:
            want = (sa.astype(np.float64) @ sb.astype(np.float64)).tocsr()
            want.sort_indices()
        t0 = time.time()
        pp = spgemm_plan_packed(A, B, layout="superblock")
        pack_s = time.time() - t0
        fp = jax.jit(lambda q, bd: spgemm_apply_packed(q, bd).data)
        res = bench_fn_slope(fp, pp, B.data, iters=6,
                             perturb_max_bytes=1 << 20)
        checked = None
        if check:
            got = np.asarray(fp(pp, B.data))
            checked = relative_check(got[: pp.c_nnz], want.data)
        n_pairs = pp.p_packed.nnz
        sol = speed_of_light_nnz_s(
            n_pairs, n_pairs * (2 * 4 + 3 * 4) + pp.c_nnz * 4)
        r = Row("spgemm_crossover/packed",
                f"n={n},d={density},pairs={n_pairs}", res, nnz=n_pairs,
                checked=checked)
        r.sol_frac = r.nnz_per_s / sol
        r.extras = {"pack_seconds": pack_s}
        rows.append(r)
        # CSC-native output: no c_nnz output permutation (see spgemm_xl)
        from ..ops.spgemm import spgemm_apply_packed_csc

        fpc = jax.jit(lambda q, bd: spgemm_apply_packed_csc(q, bd).data)
        res = bench_fn_slope(fpc, pp, B.data, iters=6,
                             perturb_max_bytes=1 << 20)
        checked = None
        if check:
            wantT = want.T.tocsr()
            wantT.sort_indices()
            got = np.asarray(fpc(pp, B.data))
            checked = relative_check(got[: pp.c_nnz], wantT.data)
        r = Row("spgemm_crossover/packed-csc",
                f"n={n},d={density},pairs={n_pairs}", res, nnz=n_pairs,
                checked=checked)
        r.sol_frac = r.nnz_per_s / sol
        r.extras = {"pack_seconds": pack_s}
        rows.append(r)
        fdn = jax.jit(lambda a, b: spgemm_densify(a, b).data)
        res = bench_fn_slope(fdn, A, B, iters=6, perturb_max_bytes=1 << 20)
        checked = None
        if check:
            got = np.asarray(fdn(A, B))
            checked = relative_check(got[want.nonzero()], want.data)
        r = Row("spgemm_crossover/densify-mxu",
                f"n={n},d={density},pairs={n_pairs}", res, nnz=n_pairs,
                checked=checked)
        r.sol_frac = None
        rows.append(r)
    return rows


@registry.register("trisolve")
def bench_trisolve(check=True, n=4096, nnz_row=8, **kw):
    """Level-scheduled triangular solve (rows/s through the level scan)."""
    import scipy.sparse as sps

    from ..ops.trisolve import trisolve_apply, trisolve_plan

    rng = np.random.default_rng(6)
    # lower-triangular with short dependency chains (random DAG depth)
    d = sps.random(n, n, density=nnz_row / n, random_state=6,
                   format="csr", dtype=np.float32)
    L = sps.tril(d, k=-1).tocsr() + sps.eye(n, format="csr", dtype=np.float32) * 4.0
    A = CSR.from_scipy(L.tocsr())
    plan = trisolve_plan(A, lower=True)
    b = jnp.asarray(gen_matrix_random(rng, n, 1)[:, 0])
    f = jax.jit(lambda p, v: trisolve_apply(p, v))
    res = bench_fn_slope(f, plan, b, iters=6, perturb_max_bytes=1 << 20)
    checked = None
    if check:
        import scipy.sparse.linalg as spla

        want = spla.spsolve_triangular(L.tocsr().astype(np.float64),
                                       np.asarray(b), lower=True)
        checked = relative_check(np.asarray(f(plan, b)), want)
    nnz = int(L.nnz)
    sol = speed_of_light_nnz_s(nnz, spmv_csr_bytes(nnz, n, n))
    r = Row("trisolve/level-sched",
            f"n={n},nnz={nnz},levels={plan.rows.shape[0]}",
            res, nnz=nnz, checked=checked)
    r.sol_frac = r.nnz_per_s / sol
    rows = [r]

    # fixed-point formulation: n_levels-1 row-lane SpMVs, no XLA gathers
    from ..ops.trisolve import trisolve_fixpoint_apply, trisolve_fixpoint_plan

    fplan = trisolve_fixpoint_plan(A, lower=True)
    ff = jax.jit(trisolve_fixpoint_apply)
    res2 = bench_fn_slope(ff, fplan, b, iters=6, perturb_max_bytes=1 << 20)
    checked2 = None
    if check:
        checked2 = relative_check(np.asarray(ff(fplan, b)), want)
    r2 = Row("trisolve/fixpoint",
             f"n={n},nnz={nnz},iters={fplan.n_iters},"
             f"fill={fplan.e_packed.fill_rate:.2f}",
             res2, nnz=nnz, checked=checked2)
    r2.sol_frac = r2.nnz_per_s / sol
    rows.append(r2)

    # level-packed: one row-lane call per level, total slab work = one SpMV
    from ..ops.trisolve import trisolve_level_apply, trisolve_level_plan

    lplan = trisolve_level_plan(A, lower=True)
    lf = jax.jit(trisolve_level_apply)
    res3 = bench_fn_slope(lf, lplan, b, iters=6, perturb_max_bytes=1 << 20)
    checked3 = None
    if check:
        checked3 = relative_check(np.asarray(lf(lplan, b)), want)
    r3 = Row("trisolve/level-packed",
             f"n={n},nnz={nnz},levels={lplan.s_idx.shape[0] + 1},"
             f"g={lplan.group}",
             res3, nnz=nnz, checked=checked3)
    r3.sol_frac = r3.nnz_per_s / sol
    rows.append(r3)

    # fused: ALL levels in one pallas call (sequential grid, x in VMEM)
    from ..ops import trisolve_fused_apply, trisolve_fused_plan

    fplan = trisolve_fused_plan(A, lower=True)
    ff = jax.jit(trisolve_fused_apply)
    res4 = bench_fn_slope(ff, fplan, b, iters=6, perturb_max_bytes=1 << 20)
    checked4 = None
    if check:
        checked4 = relative_check(np.asarray(ff(fplan, b)), want)
    r4 = Row("trisolve/fused",
             f"n={n},nnz={nnz},levels={fplan.n_levels},"
             f"groups={fplan.s_idx.shape[0]},g={fplan.group}",
             res4, nnz=nnz, checked=checked4)
    r4.sol_frac = r4.nnz_per_s / sol
    rows.append(r4)

    # waves: host-inverted diagonal blocks, MXU commits — the random
    # pattern has unbounded tile reach, so this exercises binv mode; the
    # banded/ILU regime (chain mode) is measured in ilu_cg
    import time as _t

    from ..ops import trisolve_waves_apply, trisolve_waves_plan

    t0 = _t.time()
    wplan = trisolve_waves_plan(A, lower=True)
    pack_s = _t.time() - t0
    wf = jax.jit(trisolve_waves_apply)
    res5 = bench_fn_slope(wf, wplan, b, iters=6, perturb_max_bytes=1 << 20)
    checked5 = None
    if check:
        checked5 = relative_check(np.asarray(wf(wplan, b)), want)
    r5 = Row("trisolve/waves",
             f"n={n},nnz={nnz},mode={wplan.mode},m={wplan.m},"
             f"waves={wplan.n_waves}",
             res5, nnz=nnz, checked=checked5)
    r5.sol_frac = r5.nnz_per_s / sol
    r5.extras = {"pack_seconds": pack_s}
    rows.append(r5)

    # the banded regime (Poisson ILU(0) L factor — every preconditioned
    # solver's inner loop): tile reach 1 → the chain path, grid steps =
    # n/1024 with zero gathers
    from ..ops.ilu import ilu0

    side = int(np.sqrt(n))
    import scipy.sparse as _sps

    Iq = _sps.eye(side)
    Tq = _sps.diags([-1.0, 4.0, -1.0], [-1, 0, 1], (side, side))
    Apo = (_sps.kron(Iq, Tq) + _sps.kron(
        _sps.diags([-1.0, -1.0], [-1, 1], (side, side)), Iq)).tocsr()
    Lf, _ = ilu0(CSR.from_scipy(Apo.astype(np.float32)))
    nnz_l = Lf.nnz
    bl = jnp.asarray(gen_matrix_random(rng, side * side, 1)[:, 0])
    Ld = Lf.to_scipy().astype(np.float64).tolil()
    Ld.setdiag(1.0)
    want_l = None
    if check:
        import scipy.sparse.linalg as spla

        want_l = spla.spsolve_triangular(Ld.tocsr(), np.asarray(bl),
                                         lower=True)
    sol_l = speed_of_light_nnz_s(nnz_l, spmv_csr_bytes(nnz_l, n, n))
    for label, mk, ap in (
            ("waves-ilu", lambda: trisolve_waves_plan(
                Lf, lower=True, unit_diagonal=True), wf),
            ("fused-ilu", lambda: trisolve_fused_plan(
                Lf, lower=True, unit_diagonal=True),
             jax.jit(trisolve_fused_apply))):
        t0 = _t.time()
        plan = mk()
        pack_s = _t.time() - t0
        res6 = bench_fn_slope(ap, plan, bl, iters=6, perturb_max_bytes=0)
        checked6 = None
        if check:
            checked6 = relative_check(np.asarray(ap(plan, bl)), want_l)
        mode = (f"mode={plan.mode},K={plan.K}" if hasattr(plan, "mode")
                else f"levels={plan.n_levels}")
        r6 = Row(f"trisolve/{label}", f"n={n},nnz={nnz_l},{mode}",
                 res6, nnz=nnz_l, checked=checked6)
        r6.sol_frac = r6.nnz_per_s / sol_l
        r6.extras = {"pack_seconds": pack_s}
        rows.append(r6)
        if label == "waves-ilu":
            waves_ilu_min_ms = res6.min_ms

    # multi-RHS chain solve: 8 RHS per MXU grid pass — the block-solver /
    # preconditioned-panel regime (kernels/trisolve_waves.py apply_mm)
    from ..kernels.trisolve_waves import trisolve_waves_apply_mm

    k_mm = 8
    wplan_l = trisolve_waves_plan(Lf, lower=True, unit_diagonal=True)
    Bl = jnp.asarray(gen_matrix_random(rng, side * side, k_mm))
    fmm = jax.jit(trisolve_waves_apply_mm)
    res7 = bench_fn_slope(fmm, wplan_l, Bl, iters=6, perturb_max_bytes=0)
    checked7 = None
    if check:
        import scipy.sparse.linalg as spla

        want_mm = spla.spsolve_triangular(Ld.tocsr(), np.asarray(Bl),
                                          lower=True)
        checked7 = relative_check(np.asarray(fmm(wplan_l, Bl)), want_mm)
    r7 = Row(f"trisolve/waves-ilu-mm{k_mm}",
             f"n={n},nnz={nnz_l},k={k_mm},mode={wplan_l.mode}",
             res7, nnz=nnz_l * k_mm, checked=checked7)
    # SoL: plan bytes stream once for all k RHS, plus k in/out vectors
    r7.sol_frac = r7.nnz_per_s / speed_of_light_nnz_s(
        nnz_l * k_mm, spmv_csr_bytes(nnz_l, n, n) + 2 * k_mm * n * 4)
    r7.extras = {"per_rhs_ms": res7.min_ms / k_mm,
                 "single_rhs_ms": waves_ilu_min_ms,
                 "vs_single_per_rhs": waves_ilu_min_ms
                 / max(res7.min_ms / k_mm, 1e-9)}
    rows.append(r7)
    return rows


def _poisson2d(n, eps=1.0):
    """5-point Laplacian on a √n×√n grid (anisotropic for eps != 1);
    returns (n_actual, scipy CSR)."""
    import scipy.sparse as sps

    side = int(np.sqrt(n))
    n = side * side
    Iq = sps.eye(side)
    if eps == 1.0:
        T = sps.diags([-1, 4, -1], [-1, 0, 1], (side, side))
        Apo = (sps.kron(Iq, T) + sps.kron(sps.diags([-1, -1], [-1, 1],
                                                    (side, side)),
                                          Iq)).tocsr()
    else:
        Tx = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (side, side))
        Apo = (sps.kron(Iq, Tx) + eps * sps.kron(Tx, Iq)).tocsr()
    return n, Apo


def _bench_cg_to_tol(check, n, iters, tol, maxiter, group_name,
                     eps=1.0, variant_names=None):
    """Preconditioned CG on the 2-D Poisson system: per-iteration slope
    time × measured iterations-to-tolerance = wall-clock to ‖r‖/‖b‖ ≤ tol
    (the number that decides whether preconditioning wins end-to-end).

    ``eps``: anisotropy ratio of the 5-point operator (−u_xx − eps·u_yy).
    eps=1 is the isotropic system where plain CG wins on this hardware
    (BASELINE r3); stiff anisotropy multiplies plain CG's iteration count
    (measured 12×/32× at eps=100/1000) while IC(0)'s stays flat — the
    regime where the wave-solve preconditioners win end-to-end."""
    import time

    import scipy.sparse as sps

    from ..ops.ichol import ic0_fused_plans, ic0_waves_plans, ic_apply
    from ..ops.ilu import ilu0_fixpoint_plans, ilu0_waves_plans, ilu_apply
    from ..solvers import cg

    n, Apo = _poisson2d(n, eps)
    A = CSR.from_scipy(Apo.astype(np.float32).tocsr())
    rng = np.random.default_rng(8)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b_norm = float(np.linalg.norm(np.asarray(b)))
    from ..ops.spmv import prepare_spmv

    Ap = prepare_spmv(A)

    def _mk(builder, apply_):
        t0 = time.time()
        plans = builder()
        return (lambda r: apply_(plans, r)), time.time() - t0

    builders = {
        # truncated Neumann on the row-lane SpMV layout (approximate)
        "ilu0-fix6": (lambda: ilu0_fixpoint_plans(A, n_iters=6), ilu_apply),
        # exact solves on host-inverted wave plans (trisolve_waves)
        "ilu0-waves": (lambda: ilu0_waves_plans(A), ilu_apply),
        "ic0-waves": (lambda: ic0_waves_plans(A), ic_apply),
        # bf16 inverse-block planes: halves the dominant plan stream
        "ic0-waves-bf16": (lambda: ic0_waves_plans(A, dtype=jnp.bfloat16),
                           ic_apply),
        # round-2's best exact engine, the honest race for the waves
        "ic0-fused": (lambda: ic0_fused_plans(A), ic_apply),
    }
    if variant_names is None:
        variant_names = ("ilu0-fix6", "ilu0-waves", "ic0-waves",
                         "ic0-fused")
    variants = [("plain", None, 0.0)]
    for name in variant_names:
        bld, apply_ = builders[name]
        M, s = _mk(bld, apply_)
        variants.append((name, M, s))

    rows = []
    plain_iters = None
    plain_ms_to_tol = None
    for label, precond, pack_s in variants:
        # per-iteration time: fixed-work solve (tol=0 → exactly `iters`)
        f = jax.jit(lambda bb: cg(Ap, bb, maxiter=iters, M=precond,
                                  tol=0.0).x)
        res = bench_fn_slope(f, b, iters=4, inner_lo=2, inner_hi=10)
        per_iter_ms = res.min_ms / iters
        # iterations to tolerance (recurrence residual, jitted solve)
        ft = jax.jit(lambda bb: cg(Ap, bb, maxiter=maxiter, M=precond,
                                   tol=tol))
        sol_res = ft(b)
        iters_tol = int(sol_res.iters)
        reached = bool(float(sol_res.residual) <= tol * b_norm * 1.001
                       and iters_tol < maxiter)
        ms_to_tol = per_iter_ms * iters_tol
        checked = None
        true_res = None
        if check:
            x = np.asarray(sol_res.x)
            true_res = float(np.linalg.norm(Apo @ x - np.asarray(b)))
            # tight: the tol run must actually reach tol (recurrence) and
            # the TRUE residual must confirm within a 10x fp32 margin;
            # preconditioned runs must converge in ≤ 0.6x plain's iters
            checked = bool(reached and true_res <= 10 * tol * b_norm)
            if label != "plain" and plain_iters is not None:
                checked = checked and iters_tol <= 0.6 * plain_iters
        if label == "plain":
            plain_iters = iters_tol
            plain_ms_to_tol = ms_to_tol
        nnz = A.nnz * iters
        r = Row(f"{group_name}/{label}",
                f"n={n},iters={iters},tol={tol:g}", res, nnz=nnz,
                checked=checked)
        sol = speed_of_light_nnz_s(nnz, spmv_csr_bytes(nnz, n, n))
        r.sol_frac = r.nnz_per_s / sol
        r.extras = {"per_iter_ms": per_iter_ms, "iters_to_tol": iters_tol,
                    "ms_to_tol": ms_to_tol, "reached_tol": reached,
                    "pack_seconds": pack_s}
        if label != "plain" and plain_ms_to_tol is not None:
            # the break-even the narrative owes (VERDICT r4 §7): how many
            # solves of THIS system pay back the preconditioner setup
            saved_s = (plain_ms_to_tol - ms_to_tol) / 1e3
            r.extras["solves_to_amortize"] = (
                round(pack_s / saved_s, 1) if saved_s > 0 else float("inf"))
        if true_res is not None:
            r.extras["true_rel_residual"] = true_res / b_norm
        rows.append(r)
    return rows


@registry.register("ilu_cg")
def bench_ilu_cg(check=True, n=4096, iters=25, tol=1e-6, maxiter=3000,
                 **kw):
    """End-to-end preconditioned solve at n=4096: per-iteration slope +
    wall-clock to ‖r‖/‖b‖ ≤ 1e-6 for plain/fixpoint/wave/fused CG."""
    return _bench_cg_to_tol(check, n, iters, tol, maxiter, "ilu_cg")


@registry.register("ilu_cg_xl")
def bench_ilu_cg_xl(check=True, n=65536, iters=25, tol=1e-5,
                    maxiter=6000, **kw):
    """The 65k Poisson point (side 256 → ILU tile reach 2: the wave
    solves ride the chain-K path).  tol=1e-5: at this size the fp32
    recurrence reaches 1e-6 but the TRUE residual floor sits near
    4e-6·‖b‖ (measured r3 pass_s), so 1e-6 cannot be confirmed — the
    bench pins the tightest tolerance the hardware dtype can certify."""
    return _bench_cg_to_tol(check, n, iters, tol, maxiter, "ilu_cg_xl")


@registry.register("spmm_xl")
def bench_spmm_xl(check=True, n=32768, k=32, **kw):
    """XL multi-RHS regime map (TODO_ROUND5 item 2): at huge n the dense
    pre-densify path streams n²·2 bytes of bf16 A per apply (a fixed
    ~2.6 ms floor at n=32768), so the dual-gather walk wins wherever its
    slab bytes + VPU gathers undercut that — measured crossover d ≈ 0.01
    (probe_spmm_sb: walk 2.5× at nnz/row=64, pre-dense 1.09× at 507).
    The kt1 pack beats the superblock-mm variants at BOTH points (the
    sb kernel's per-column scratch RMW costs more than kt1's per-tile
    grid granularity saves); superblock packs still run spmm through the
    sb kernel so one pack can serve spmv AND spmm without repacking."""
    import scipy.sparse as sps

    from ..kernels.spmm_dualgather import spmm_dualgather
    from ..kernels.spmv_dualgather import pack_dualgather

    rng = np.random.default_rng(6)
    rows = []
    for nnz_row in (64, 507):
        d = nnz_row / n
        sp = sps.random(n, n, density=d, random_state=5, format="csr",
                        dtype=np.float32)
        sp.data = rng.uniform(-1, 1, sp.nnz).astype(np.float32)
        A = CSR.from_scipy(sp)
        X = jnp.asarray(rng.uniform(-1, 1, (n, k)), np.float32)
        want = None
        if check:
            want = sp.astype(np.float64) @ np.asarray(X, np.float64)
        pk = pack_dualgather(A, k_tiles=1)
        f = jax.jit(lambda x, q: spmm_dualgather(q, x))
        res = bench_fn_slope(f, X, pk, iters=4, inner_lo=2, inner_hi=10,
                             perturb_max_bytes=1 << 20)
        checked = None
        if check:
            got = np.asarray(f(X, pk))
            checked = relative_check(got, want)
        r = Row("spmm_xl/walk-kt1",
                f"n={n},k={k},nnz/row={nnz_row},fill={pk.fill_rate:.2f}",
                res, nnz=sp.nnz, checked=checked)
        bytes_moved = (sp.nnz * (1 + 1 + 4) / max(pk.fill_rate, 1e-6)
                       + n * k * 8)
        r.sol_frac = r.nnz_per_s / speed_of_light_nnz_s(sp.nnz, bytes_moved)
        rows.append(r)
        # pre-dense bf16 race: the streaming-bound alternative
        ad = jnp.asarray(sp.toarray(), jnp.bfloat16)
        fd = jax.jit(lambda a, x: (a @ x.astype(jnp.bfloat16)).astype(
            jnp.float32))
        res = bench_fn_slope(fd, ad, X, iters=4, inner_lo=2, inner_hi=10,
                             perturb_max_bytes=1 << 20)
        checked = None
        if check:
            from ..utils.testutils import quantized_check

            got = np.asarray(fd(ad, X))
            checked = quantized_check(got, want)  # bf16 operand rounding
        r = Row("spmm_xl/pre-dense-bf16", f"n={n},k={k},nnz/row={nnz_row}",
                res, nnz=sp.nnz, checked=checked)
        r.sol_frac = None
        rows.append(r)
        del ad
    # low-degree XL point (VERDICT r4 §5): ~2 entries/row — the octet
    # multi-RHS walk vs the kt1 dual-gather walk.  MEASURED NEGATIVE for
    # octet-mm (1.61 ms fill 0.04 vs walk 0.68 ms): scattered entries
    # leave ~8 live cells per octet-window; the rows stay as the record
    # and ops.spmm auto keeps the walk
    import scipy.sparse as _sps

    from ..kernels.spmv_octet import pack_octet, spmm_octet

    nnz_row = 2
    g2 = np.random.default_rng(12)
    rows_ = np.repeat(np.arange(n), nnz_row)
    cols_ = g2.integers(0, n, rows_.size)
    data_ = g2.uniform(-1, 1, rows_.size).astype(np.float32)
    sp = _sps.coo_matrix((data_, (rows_, cols_)), shape=(n, n)).tocsr()
    sp.sum_duplicates()
    A = CSR.from_scipy(sp)
    X = jnp.asarray(g2.uniform(-1, 1, (n, k)), np.float32)
    want = sp.astype(np.float64) @ np.asarray(X, np.float64) if check \
        else None
    pk_o = pack_octet(A)
    fo = jax.jit(lambda x, q: spmm_octet(q, x))
    res = bench_fn_slope(fo, X, pk_o, iters=4, inner_lo=2, inner_hi=10,
                         perturb_max_bytes=1 << 20)
    checked = (relative_check(np.asarray(fo(X, pk_o)), want)
               if check else None)
    r = Row("spmm_xl/octet-mm",
            f"n={n},k={k},nnz/row={nnz_row},fill={pk_o.fill_rate:.2f}",
            res, nnz=sp.nnz, checked=checked)
    bytes_moved = (sp.nnz * (3 + 4) / max(pk_o.fill_rate, 1e-6)
                   + n * k * 8)
    r.sol_frac = r.nnz_per_s / speed_of_light_nnz_s(sp.nnz, bytes_moved)
    rows.append(r)
    from ..ops.spmm_lowdeg import pack_sliced_ell, spmm_sliced_ell

    pk_s = pack_sliced_ell(A)
    fse = jax.jit(spmm_sliced_ell)
    # default inner counts: at ~0.24 ms this row needs the long chains
    # (the short (2, 10) pair measured 2.85 ms of pure jitter)
    res = bench_fn_slope(fse, pk_s, X, iters=6,
                         perturb_max_bytes=1 << 20)
    checked = (relative_check(np.asarray(fse(pk_s, X)), want)
               if check else None)
    r = Row("spmm_xl/sliced-ell",
            f"n={n},k={k},nnz/row={nnz_row},segs={len(pk_s.vals)},"
            f"fill={pk_s.fill_rate:.2f}",
            res, nnz=sp.nnz, checked=checked)
    # honest bytes for the row-gather algorithm: each entry drags a
    # k-float X row (÷ fill for segment padding) + X read + Y write
    bytes_moved = sp.nnz * k * 4 / max(pk_s.fill_rate, 1e-6) + n * k * 8
    r.sol_frac = r.nnz_per_s / speed_of_light_nnz_s(sp.nnz, bytes_moved)
    rows.append(r)
    from ..kernels.spmv_dualgather import pack_dualgather as _pdg

    pk_w = _pdg(A, k_tiles=1)
    fw = jax.jit(lambda x, q: spmm_dualgather(q, x))
    res = bench_fn_slope(fw, X, pk_w, iters=4, inner_lo=2, inner_hi=10,
                         perturb_max_bytes=1 << 20)
    checked = (relative_check(np.asarray(fw(X, pk_w)), want)
               if check else None)
    r = Row("spmm_xl/walk-kt1",
            f"n={n},k={k},nnz/row={nnz_row},fill={pk_w.fill_rate:.2f}",
            res, nnz=sp.nnz, checked=checked)
    bytes_moved = (sp.nnz * (1 + 1 + 4) / max(pk_w.fill_rate, 1e-6)
                   + n * k * 8)
    r.sol_frac = r.nnz_per_s / speed_of_light_nnz_s(sp.nnz, bytes_moved)
    rows.append(r)
    return rows


@registry.register("block_cg_xl")
def bench_block_cg_xl(check=True, n=65536, k=8, iters=25, tol=1e-5,
                      maxiter=4000, **kw):
    """Multi-RHS XL regime (TODO_ROUND5 item 6): does preconditioning pay
    when k systems solve at once?  BOTH sides amortize — plain block CG
    turns the SpMV into a strip-SpMM (one band stream serves k columns),
    and ic0-waves turns the latency-bound wave solve into k-RHS MXU
    passes (trisolve_waves_apply_mm) — so the ms-to-tol race, not either
    side's speedup, decides.  The seq-plain-x{k} row is the do-nothing
    baseline: k independent single-RHS plain CG solves."""
    import time

    from ..ops.ichol import ic0_waves_plans, ic_apply
    from ..ops.spmv import prepare_spmv
    from ..solvers import cg
    from ..solvers.block import block_cg

    n, Apo = _poisson2d(n)
    A = CSR.from_scipy(Apo.astype(np.float32).tocsr())
    rng = np.random.default_rng(9)
    B = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    bnorm = np.linalg.norm(np.asarray(B), axis=0)
    # matmat: the dual-gather multi-RHS walk — Poisson's window locality
    # gives it near-perfect fill; measured ≤31 µs per k=8 matmat at
    # n=65536 vs 640 µs for the strip batched-MXU form (StripDense
    # densifies the 5-point band at ~0.8 % fill and streams 168 MB)
    from ..kernels.spmm_dualgather import spmm_dualgather
    from ..kernels.spmv_dualgather import pack_dualgather

    S = pack_dualgather(A, k_tiles=1)

    rows = []
    # seq-plain baseline: single-RHS plain CG on the auto pack, scaled ×k
    # (packs/plans travel as jit ARGUMENTS — closed-over they get baked
    # into the HLO and the relay compile endpoint rejects >100 MB bodies)
    Ap = prepare_spmv(A)
    f1 = jax.jit(lambda bb, q: cg(q, bb, maxiter=iters, tol=0.0).x)
    res1 = bench_fn_slope(f1, B[:, 0], Ap, iters=4, inner_lo=2, inner_hi=10)
    sol1 = jax.jit(lambda bb, q: cg(q, bb, maxiter=maxiter, tol=tol))(
        B[:, 0], Ap)
    it1 = int(sol1.iters)
    per1 = res1.min_ms / iters
    from ..utils.timer import BenchResult

    r = Row(f"block_cg_xl/seq-plain-x{k}", f"n={n},k={k},tol={tol:g}",
            BenchResult(mean_ms=per1 * iters * k, min_ms=per1 * iters * k,
                        compile_ms=0.0, iters=res1.iters, extras={}),
            nnz=A.nnz * iters * k,
            checked=bool(float(sol1.residual) <= tol * bnorm[0] * 1.001)
            if check else None)
    r.sol_frac = None
    r.extras = {"per_iter_ms": per1 * k, "iters_to_tol": it1,
                "ms_to_tol": per1 * it1 * k}
    rows.append(r)

    t0 = time.time()
    plans = ic0_waves_plans(A)
    pack_s = time.time() - t0
    variants = [("block-plain", None, 0.0),
                ("block-ic0-waves", True, pack_s)]
    for label, M, ps in variants:
        use_M = M is not None

        def _mk(maxit, tl):
            @jax.jit
            def run(bb, Sq, pl):
                mm = lambda V: spmm_dualgather(Sq, V)
                Mf = (lambda R: ic_apply(pl, R)) if use_M else None
                return block_cg(mm, bb, maxiter=maxit, tol=tl, M=Mf)

            return run

        f = lambda bb, Sq, pl, run=_mk(iters, 0.0): run(bb, Sq, pl).x
        res = bench_fn_slope(f, B, S, plans, iters=4, inner_lo=2,
                             inner_hi=10)
        per_iter_ms = res.min_ms / iters
        sol = _mk(maxiter, tol)(B, S, plans)
        iters_tol = int(sol.iters)
        reached = bool(
            np.all(np.asarray(sol.residuals) <= tol * bnorm * 1.001)
            and iters_tol < maxiter)
        checked = None
        if check:
            X = np.asarray(sol.x)
            true_res = np.linalg.norm(Apo @ X - np.asarray(B), axis=0)
            checked = bool(reached and np.all(true_res <= 10 * tol * bnorm))
        r = Row(f"block_cg_xl/{label}", f"n={n},k={k},tol={tol:g}", res,
                nnz=A.nnz * iters * k, checked=checked)
        r.sol_frac = None
        r.extras = {"per_iter_ms": per_iter_ms, "iters_to_tol": iters_tol,
                    "ms_to_tol": per_iter_ms * iters_tol,
                    "reached_tol": reached, "pack_seconds": ps}
        rows.append(r)
    return rows


@registry.register("ilu_cg_aniso")
def bench_ilu_cg_aniso(check=True, n=65536, iters=25, tol=1e-5,
                       maxiter=12000, eps=1000.0, **kw):
    """The demonstrated preconditioner WIN case (VERDICT r3 weak item 5):
    stiff anisotropic Poisson (−u_xx − 1000·u_yy).  Plain CG's iteration
    count blows up ~32× while IC(0)'s stays flat (measured on the CPU
    oracle), so the wave engine's per-iteration premium is finally paid
    for.  Isotropic Poisson (ilu_cg/ilu_cg_xl) remains the honest
    negative: plain CG wins there."""
    return _bench_cg_to_tol(check, n, iters, tol, maxiter, "ilu_cg_aniso",
                            eps=eps,
                            variant_names=("ic0-waves", "ic0-waves-bf16"))


@registry.register("codebook_gemm")
def bench_codebook_gemm(check=True, density=0.25, **kw):
    """The reference's own benchmark: sparse AddMatMat at its default shape
    (blas_test.cc:32, blas_test.h:216-252), at the CLI-provided ref_m/n/k.
    Variants: CodebookCSR auto (density-adaptive densify), forced
    segment-sum, XLA dequant, and the fused Pallas kernel."""
    m = kw.get("ref_m", REF_M)
    n = kw.get("ref_n", REF_N)
    k = kw.get("ref_k", REF_K)
    from ..formats import CodebookDense
    from ..ops import add_mat_mat_int8, quantize_codebook, spmm

    rng = np.random.default_rng(4)
    a = jnp.asarray(gen_matrix_random(rng, m, k))
    c = jnp.asarray(gen_matrix_random(rng, m, n))
    idx_mtx, table = gen_sparse_index_matrix(rng, k, n, density=density,
                                             table_size=255)
    b_csr = CodebookCSR.from_index_matrix(idx_mtx, table, trans=True)
    b_dns = CodebookDense.from_index_matrix(idx_mtx, table, trans=True)
    b_dense_np = np.asarray(b_csr.todense()).T.astype(np.float64)
    oracle = np.asarray(c) + np.asarray(a).astype(np.float64) @ b_dense_np
    # the bf16 variant is a quantized path: its error is ~0.4 % of the
    # OUTPUT SCALE (operand rounding), which a per-element relative policy
    # cannot express at cancellation points — judge it against the fp64
    # oracle with a scale-floored denominator instead

    def _bf16_check(got):
        scale = np.abs(oracle).max()
        rel = np.abs(got - oracle) / (np.abs(oracle) + 0.02 * scale)
        return bool(np.median(rel) < 0.02 and np.quantile(rel, 0.99) < 0.1)

    def _int8_check(got):
        # per-tensor symmetric int8 on both operands: ~0.8 % per-operand
        # grid error, judged on the same scale-floored basis
        scale = np.abs(oracle).max()
        rel = np.abs(got - oracle) / (np.abs(oracle) + 0.02 * scale)
        return bool(np.median(rel) < 0.04 and np.quantile(rel, 0.99) < 0.2)

    from ..kernels.codebook_pallas import codebook_matmul

    rows = []
    # the weights are encode-once constants (the reference's whole design,
    # sparse-matrix.cc:21 vs :140) — so each variant CLOSES OVER its
    # container: the eager-dispatch conveniences (auto conversion, packing
    # caches) see the concrete object even while a/c stay jitted inputs
    all_variants = {
        "csr-auto": jax.jit(
            lambda aa, cc: add_mat_mat(aa, b_csr, cc, 1.0, 1.0)),
        "csr-segsum": jax.jit(
            lambda aa, cc: cc + spmm(b_csr, aa.T, method="sparse").T),
        "dense-dequant": jax.jit(
            lambda aa, cc: cc + spmm_densify(b_dns, aa.T).T),
        "fused-pallas": jax.jit(
            lambda aa, cc: cc + codebook_matmul(aa, b_dns)),
        # bf16 MXU variant: checked vs the both-operands-bf16 oracle
        "fused-pallas-bf16": jax.jit(
            lambda aa, cc: cc + codebook_matmul(
                aa.astype(jnp.bfloat16), b_dns).astype(jnp.float32)),
        # bf16 dequant: the dense-dequant path is HBM-bound (~20 MB at
        # fp32), so dequantizing the LUT to bf16 halves the dominant
        # B-materialization traffic (~12 MB); same quantized-oracle check
        # as the fused bf16 kernel
        "dense-dequant-bf16": jax.jit(
            lambda aa, cc: cc + jnp.dot(
                aa.astype(jnp.bfloat16),
                b_dns.val_table.astype(jnp.bfloat16)[
                    b_dns.idx.astype(jnp.int32)].T,
            ).astype(jnp.float32)),
    }

    def _int8_variant():
        # int8 activations x int8 codebook on the MXU's integer path —
        # the analogue of the fork-only cblas_wgemm_plus
        # (/root/reference/openblas_darwin_plus/include/cblas.h:252-257);
        # quantized lazily so unrelated headline runs don't pay the encode
        b_q = quantize_codebook(b_dns)
        return jax.jit(lambda aa, cc: add_mat_mat_int8(aa, b_q, cc, 1.0, 1.0))

    all_variants["int8-gemm"] = _int8_variant

    def _int16_variant():
        # int16 activations (the exact cblas_wgemm_plus signature,
        # cblas.h:252-257): hi/lo byte-split double-pump of the int8 MXU
        # (ops/quantized.py add_mat_mat_int16) — 2 integer passes for a
        # 256x finer activation grid; residual error is the int8 TABLE
        # quantization, so it is judged at the bf16-grade tolerance
        from ..ops.quantized import add_mat_mat_int16

        b_q = quantize_codebook(b_dns)
        return jax.jit(
            lambda aa, cc: add_mat_mat_int16(aa, b_q, cc, 1.0, 1.0))

    all_variants["int16-gemm"] = _int16_variant
    names = kw.get("variants") or ("csr-auto", "dense-dequant",
                                   "dense-dequant-bf16", "fused-pallas",
                                   "fused-pallas-bf16", "int8-gemm",
                                   "int16-gemm")
    for vname in names:
        f = all_variants[vname]
        if vname in ("int8-gemm", "int16-gemm"):
            f = f()  # lazy factory
        name = f"codebook_gemm/{vname}"
        # fast variants need more in-graph reps to rise above the ~28 ms
        # relay-latency noise floor
        lo, hi = (16, 144) if vname.startswith("fused-pallas") else (8, 72)
        try:
            res = bench_fn_slope(f, a, c, iters=8, inner_lo=lo, inner_hi=hi)
            if not check:
                checked = None
            elif vname.endswith("bf16"):
                checked = _bf16_check(np.asarray(f(a, c)))
            elif vname == "int8-gemm":
                checked = _int8_check(np.asarray(f(a, c)))
            elif vname == "int16-gemm":
                checked = _bf16_check(np.asarray(f(a, c)))
            else:
                checked = relative_check(np.asarray(f(a, c)), oracle)
        except Exception as e:  # a variant failing to compile must not
            import sys          # take down the whole bench

            print(f"[bench] variant {name} failed: {type(e).__name__}",
                  file=sys.stderr)
            continue
        r = Row(name, f"m={m},n={n},k={k},d={density}", res, nnz=b_csr.nnz,
                checked=checked)
        r.extras = {"vs_baseline": REF_BASELINE_MS / res.min_ms}
        rows.append(r)
    if not rows:
        raise RuntimeError("all codebook_gemm variants failed")
    # the honesty race the reference always runs (blas_test.cc:41): plain
    # dense GEMM of the same problem on the same chip, both precisions
    b_dense32 = jnp.asarray(b_dense_np.astype(np.float32))
    for prec, tag in ((jax.lax.Precision.HIGHEST, "fp32"),
                      (jax.lax.Precision.DEFAULT, "bf16")):
        fd = jax.jit(lambda aa, bb, cc, p=prec: cc + jnp.dot(
            aa, bb, precision=p))
        res = bench_fn_slope(fd, a, b_dense32, c, iters=8,
                             inner_lo=16, inner_hi=144)
        r = Row(f"codebook_gemm/dense-race-{tag}",
                f"m={m},n={n},k={k} dense on-MXU", res, nnz=b_csr.nnz)
        r.extras = {"vs_baseline": REF_BASELINE_MS / res.min_ms}
        rows.append(r)
    # the reference harness's third lane: PREPACKED dense GEMM
    # (SGEMM_PRE_INVOKER, blas_test.cc:43, blas_test.h:254-290) — operand
    # layout conversion paid once at encode time, the timed call reuses
    # it.  TPU analogue: operands pre-cast to the MXU-native bf16 at
    # build; the timed call is the single-pass systolic contraction with
    # fp32 accumulate (vs dense-race-fp32's per-call multi-pass HIGHEST).
    a_pre = a.astype(jnp.bfloat16)
    b_pre = b_dense32.astype(jnp.bfloat16)
    fp = jax.jit(lambda aa, bb, cc: cc + jnp.dot(
        aa, bb, preferred_element_type=jnp.float32))
    res = bench_fn_slope(fp, a_pre, b_pre, c, iters=8,
                         inner_lo=16, inner_hi=144)
    checked = _bf16_check(np.asarray(fp(a_pre, b_pre, c))) if check else None
    r = Row("codebook_gemm/dense-race-pre",
            f"m={m},n={n},k={k} prepacked bf16 on-MXU", res, nnz=b_csr.nnz,
            checked=checked)
    r.extras = {"vs_baseline": REF_BASELINE_MS / res.min_ms}
    rows.append(r)
    return rows
