from .testutils import (
    gen_matrix_random,
    gen_sparse_index_matrix,
    gen_random_csr,
    relative_check,
)
