"""Context experiment for the sliced-ELL in-group anomaly (TODO_ROUND6 §11).

The spmx_xl group measures `spmm_xl/sliced-ell` at 2.85 ms while the
dedicated probe measures 0.240 ms (same matrix, pack, jit).  Pass 1 of
this experiment exonerated the nnz/row=64 walk pack and the 32768² bf16
dense arrays (clean 0.283 ms, unchanged under both).  Pass 2 (this
file): the nnz/row=507 walk pack (~67 MB), the octet pack, and having
EXECUTED the other jitted programs.

Run: timeout 570 python benchmarks/probe_sell_ctx.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.ops.spmm_lowdeg import pack_sliced_ell, spmm_sliced_ell
from sparsematrix_tpu.utils.timer import bench_fn_slope

n, k = 32768, 32
nnz_row = 2
g2 = np.random.default_rng(12)
rows_ = np.repeat(np.arange(n), nnz_row)
cols_ = g2.integers(0, n, rows_.size)
data_ = g2.uniform(-1, 1, rows_.size).astype(np.float32)
sp = sps.coo_matrix((data_, (rows_, cols_)), shape=(n, n)).tocsr()
sp.sum_duplicates()
A = CSR.from_scipy(sp)
Xh = g2.uniform(-1, 1, (n, k)).astype(np.float32)
X = jnp.asarray(Xh)

pk = pack_sliced_ell(A)
fse = jax.jit(spmm_sliced_ell)
fse(pk, X).block_until_ready()


def step(tag):
    res = bench_fn_slope(fse, pk, X, iters=6, perturb_max_bytes=1 << 20)
    print(f"{tag:28s} {res.min_ms:7.3f} ms", flush=True)


step("clean")

from sparsematrix_tpu.kernels.spmv_dualgather import pack_dualgather

rng = np.random.default_rng(6)
spw = sps.random(n, n, density=507 / n, random_state=5, format="csr",
                 dtype=np.float32)
spw.data = rng.uniform(-1, 1, spw.nnz).astype(np.float32)
print("packing 507-row walk...", flush=True)
pk507 = pack_dualgather(CSR.from_scipy(spw), k_tiles=1)
jax.block_until_ready(pk507)
step("+walk pack nnz/row=507")

from sparsematrix_tpu.kernels.spmm_dualgather import spmm_dualgather

fwalk = jax.jit(lambda x, q: spmm_dualgather(q, x))
fwalk(X, pk507).block_until_ready()
step("after 507 walk executed")

from sparsematrix_tpu.kernels.spmv_octet import pack_octet, spmm_octet

pk_o = pack_octet(A)
jax.block_until_ready(pk_o)
step("+octet pack")

fo = jax.jit(lambda x, q: spmm_octet(q, x))
fo(X, pk_o).block_until_ready()
step("after octet executed")
