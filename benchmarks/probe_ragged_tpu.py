"""TPU smoke for the ragged_all_to_all halo branch (VERDICT r3 item 4).

XLA:CPU cannot run it (UNIMPLEMENTED: HLO opcode `ragged-all-to-all` is not
supported by XLA:CPU ThunkEmitter — probed 2026-08-20, jax 0.9.0), so the
branch is exercised on a 1-device TPU mesh: same shard_map code path,
one participant, oracle-checked against scipy.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import sys
sys.path.insert(0, "/root/repo")
from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.parallel.halo import partition_csr_halo_var, dist_spmv_halo_var
import scipy.sparse as sp

print("backend:", jax.default_backend(), "devices:", jax.devices())
rng = np.random.default_rng(0)
n = 1024
A = sp.random(n, n, density=0.01, format="csr", random_state=0,
              data_rvs=lambda k: rng.normal(size=k).astype(np.float32))
# add a band so halos are nontrivial
A = (A + sp.diags([np.ones(n-1), np.ones(n), np.ones(n-1)], [-1, 0, 1])).tocsr()
A = A.astype(np.float32)
x = rng.normal(size=n).astype(np.float32)

csr = CSR.from_scipy(A)
mesh = Mesh(np.array(jax.devices()[:1]), ("shard",))
part = partition_csr_halo_var(csr, n_shards=1)
y = dist_spmv_halo_var(part, jnp.asarray(x), mesh, use_ragged=True)
y = np.asarray(y)
ref = A @ x
err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-30)
print("max rel err:", err)
assert err < 1e-5, err
print("RAGGED_TPU_SMOKE_OK")
