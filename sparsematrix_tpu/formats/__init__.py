from .base import SparseFormat
from .coo import COO
from .csr import CSR, CSC
from .ell import ELL, BlockedELL
from .bsr import BSR
from .dense import Dense
from .quantdense import QuantDense
from .stripdense import StripDense
from .codebook_dense import CodebookDense
from .codebook import (
    CodebookCSR,
    CodebookStream,
    encode_stream,
    decode_stream,
    stream_to_codebook_csr,
)
from .validate import validate
from .convert import (
    coo_to_csr,
    csr_to_coo,
    csr_to_ell,
    csr_to_blocked_ell,
    csr_to_bsr,
    bsr_to_csr,
    ell_to_csr,
)

__all__ = [
    "SparseFormat",
    "COO",
    "CSR",
    "CSC",
    "ELL",
    "BlockedELL",
    "BSR",
    "CodebookCSR",
    "CodebookDense",
    "Dense",
    "QuantDense",
    "StripDense",
    "CodebookStream",
    "encode_stream",
    "decode_stream",
    "stream_to_codebook_csr",
    "coo_to_csr",
    "csr_to_coo",
    "csr_to_ell",
    "csr_to_blocked_ell",
    "csr_to_bsr",
    "bsr_to_csr",
    "ell_to_csr",
    "validate",
]
