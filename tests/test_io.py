"""IO: matrix-market bridge and npz save/load roundtrips."""
import numpy as np

from sparsematrix_tpu.formats import BSR, CSR, CodebookCSR
from sparsematrix_tpu.io import load_npz, read_mtx, save_npz, write_mtx
from sparsematrix_tpu.utils.testutils import (
    gen_random_dense_sparse,
    gen_sparse_index_matrix,
)


def test_mtx_roundtrip(rng, tmp_path):
    dense = gen_random_dense_sparse(rng, 40, 60, density=0.2)
    csr = CSR.fromdense(dense)
    p = str(tmp_path / "m.mtx")
    write_mtx(p, csr)
    back = read_mtx(p, fmt="csr")
    np.testing.assert_allclose(np.asarray(back.todense()), dense, rtol=1e-6)


def test_npz_roundtrip_csr(rng, tmp_path):
    dense = gen_random_dense_sparse(rng, 33, 47, density=0.3)
    csr = CSR.fromdense(dense, capacity=600)
    p = str(tmp_path / "m.npz")
    save_npz(p, csr)
    back = load_npz(p)
    assert isinstance(back, CSR)
    assert back.shape == csr.shape and back.nnz == csr.nnz
    np.testing.assert_array_equal(np.asarray(back.todense()), dense)


def test_npz_roundtrip_codebook(rng, tmp_path):
    idx_mtx, table = gen_sparse_index_matrix(rng, 20, 30, density=0.4,
                                             table_size=7)
    cb = CodebookCSR.from_index_matrix(idx_mtx, table)
    p = str(tmp_path / "cb.npz")
    save_npz(p, cb)
    back = load_npz(p)
    assert isinstance(back, CodebookCSR)
    assert back.table_size == cb.table_size
    np.testing.assert_array_equal(np.asarray(back.todense()),
                                  np.asarray(cb.todense()))


def test_npz_roundtrip_bsr(rng, tmp_path):
    dense = gen_random_dense_sparse(rng, 32, 32, density=0.2)
    bsr = BSR.fromdense(dense, block_shape=(8, 8))
    p = str(tmp_path / "b.npz")
    save_npz(p, bsr)
    back = load_npz(p)
    np.testing.assert_array_equal(np.asarray(back.todense()), dense)


def test_orbax_sharded_checkpoint_roundtrip(rng, tmp_path):
    """Sharded save/restore on the 8-device mesh (SURVEY §5: distributed
    configs need restartable state; orbax path io/serialize.py)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sparsematrix_tpu.io import load_checkpoint, save_checkpoint
    from sparsematrix_tpu.formats import CSR
    from sparsematrix_tpu.parallel import partition_csr_rows

    dense = gen_random_dense_sparse(rng, 64, 64, density=0.1)
    part = partition_csr_rows(CSR.fromdense(dense), n_shards=8)

    mesh = Mesh(np.array(jax.devices()), ("shard",))
    sh = NamedSharding(mesh, P("shard"))
    arrays = {
        "indptr": jax.device_put(part.indptr, sh),
        "indices": jax.device_put(part.indices, sh),
        "data": jax.device_put(part.data, sh),
        "row_ids": jax.device_put(part.row_ids, sh),
        "x": jax.device_put(jnp.arange(64.0).reshape(8, 8), sh),
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, arrays)

    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
        arrays,
    )
    back = load_checkpoint(path, abstract)
    for k in arrays:
        got = back[k]
        assert got.sharding == arrays[k].sharding, k
        np.testing.assert_array_equal(np.asarray(got), np.asarray(arrays[k]))
