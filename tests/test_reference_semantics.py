"""Pin the reference's exact semantic contract (CopyForm/AddMatMat rules).

Each test encodes one behavioral rule from the reference source so parity
regressions are caught by name:
  * indices outside [0, table_size) mean zero (sparse-matrix.cc:44)
  * the sentinel table slot holds 0 (sparse-matrix.cc:29-31)
  * ``trans`` encode equals encoding the transposed index matrix
    (sparse-matrix.cc:65-98)
  * alpha scales the product, beta scales C (sparse-matrix.cc:140-194)
  * the wire format stores deltas with 255-bridged fillers
    (sparse-matrix.cc:46-51)
"""
import jax.numpy as jnp
import numpy as np

from sparsematrix_tpu.formats import (
    CodebookCSR,
    CodebookDense,
    decode_stream,
    encode_stream,
)
from sparsematrix_tpu.ops import add_mat_mat


def test_out_of_table_indices_are_zero():
    table = np.array([1.5, -2.0], dtype=np.float32)
    idx = np.array([[0, 1, 2, 5, 255, -1 & 0xFF]], dtype=np.int64)
    for cls in (CodebookCSR, CodebookDense):
        A = cls.from_index_matrix(idx, table)
        out = np.asarray(A.todense())
        np.testing.assert_array_equal(out[0, :2], [1.5, -2.0])
        np.testing.assert_array_equal(out[0, 2:], 0.0)
        assert A.nnz == 2


def test_sentinel_slot_is_zero():
    table = np.array([3.0], dtype=np.float32)
    A = CodebookCSR.from_index_matrix(np.array([[0, 1]]), table)
    assert float(np.asarray(A.val_table)[-1]) == 0.0
    B = CodebookDense.from_index_matrix(np.array([[0, 1]]), table)
    assert float(np.asarray(B.val_table)[-1]) == 0.0


def test_trans_encode_equals_transposed_matrix(rng):
    from sparsematrix_tpu.utils.testutils import gen_sparse_index_matrix

    idx, table = gen_sparse_index_matrix(rng, 13, 29, density=0.4, table_size=7)
    for cls in (CodebookCSR, CodebookDense):
        a = cls.from_index_matrix(idx, table, trans=True)
        b = cls.from_index_matrix(idx.T, table, trans=False)
        np.testing.assert_array_equal(np.asarray(a.todense()),
                                      np.asarray(b.todense()))


def test_alpha_beta_contract(rng):
    from sparsematrix_tpu.utils.testutils import (
        gen_matrix_random,
        gen_sparse_index_matrix,
    )

    m, n, k = 5, 12, 9
    a = gen_matrix_random(rng, m, k) / 100
    c = gen_matrix_random(rng, m, n) / 100
    idx, table = gen_sparse_index_matrix(rng, k, n, density=0.5, table_size=7)
    b_t = CodebookCSR.from_index_matrix(idx, table, trans=True)
    B = np.asarray(b_t.todense()).T
    for alpha, beta in ((1.0, 1.0), (1.8, 1.2), (2.0, 0.0), (0.0, 3.0)):
        got = np.asarray(add_mat_mat(jnp.asarray(a), b_t, jnp.asarray(c),
                                     alpha, beta))
        want = beta * c + alpha * (a.astype(np.float64) @ B)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_wire_deltas_bridge_with_fillers():
    # panels are 256 columns wide; the in-panel position is row*256 + col,
    # so (row 0, col 0) → (row 1, col 1) is a delta of 257 > 255: one
    # filler (255, sentinel) then delta 2
    idx = np.full((2, 100), 99, dtype=np.int64)
    idx[0, 0] = 0
    idx[1, 1] = 1
    table = np.array([1.0, 2.0], dtype=np.float32)
    s = encode_stream(idx, table)
    np.testing.assert_array_equal(s.pos_delta, [0, 255, 2])
    np.testing.assert_array_equal(s.val_idx, [0, 2, 1])  # 2 = sentinel
    dec = decode_stream(s)
    assert dec[0, 0] == 1.0 and dec[1, 1] == 2.0


def test_delta_255_stored_directly_no_filler():
    # delta == 255 fits in one byte (the reference bridges only > 255,
    # sparse-matrix.cc:46: `while (pos > zero_pad_interval)`):
    # (row 0, col 0) → (row 0, col 255) is exactly 255
    idx = np.full((1, 256), 99, dtype=np.int64)
    idx[0, 0] = 0
    idx[0, 255] = 1
    table = np.array([1.0, 2.0], dtype=np.float32)
    s = encode_stream(idx, table)
    np.testing.assert_array_equal(s.pos_delta, [0, 255])
    np.testing.assert_array_equal(s.val_idx, [0, 1])


def test_column_256_starts_a_new_panel():
    # col 256 lives in panel 1 at in-panel position 0 → fresh delta 0
    idx = np.full((1, 300), 99, dtype=np.int64)
    idx[0, 0] = 0
    idx[0, 256] = 1
    table = np.array([1.0, 2.0], dtype=np.float32)
    s = encode_stream(idx, table)
    np.testing.assert_array_equal(s.pos_delta, [0, 0])
    assert s.panel_origins.shape[0] == 2
    np.testing.assert_array_equal(decode_stream(s)[0, [0, 256]], [1.0, 2.0])


def test_decode_stream_transposed_emit(rng):
    # CopyTo can emit either orientation (sparse-matrix.cc:108-136):
    # the transposed decode is exactly the direct decode transposed
    from sparsematrix_tpu.utils.testutils import gen_sparse_index_matrix

    idx, table = gen_sparse_index_matrix(rng, 37, 300, density=0.3,
                                         table_size=15)
    s = encode_stream(idx, table)
    direct = decode_stream(s)
    transposed = decode_stream(s, trans=True)
    assert transposed.shape == (direct.shape[1], direct.shape[0])
    np.testing.assert_array_equal(transposed, direct.T)


def test_trans_encode_then_trans_decode_roundtrips(rng):
    # CopyForm(trans) ∘ CopyTo(trans) = identity on the value matrix
    # (the reference SelfTest exercises both orientations,
    # sparse-matrix.cc:228-246)
    from sparsematrix_tpu.utils.testutils import gen_sparse_index_matrix

    idx, table = gen_sparse_index_matrix(rng, 23, 280, density=0.4,
                                         table_size=9)
    s = encode_stream(idx, table, trans=True)  # stores idx^T
    back = decode_stream(s, trans=True)  # emits (idx^T)^T = idx values
    ts = len(table)
    expect = np.where((idx >= 0) & (idx < ts),
                      np.concatenate([table, [0.0]]).astype(np.float32)[
                          np.clip(idx, 0, ts)], 0.0)
    np.testing.assert_array_equal(back, expect.astype(np.float32))
