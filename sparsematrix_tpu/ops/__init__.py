from .spmv import prepare_spmv, spmv, spmv_reference
from .spmm import spmm, spmm_reference, spmm_right, spmm_densify
from .addmatmat import add_mat_mat
from .spgemm import (SpGEMMPacked, SpGEMMPlan, spgemm, spgemm_apply,
                     spgemm_apply_packed, spgemm_apply_packed_csc,
                     spgemm_densify, spgemm_extract,
                     spgemm_plan, spgemm_plan_packed)
from .trisolve import (
    TriFixPlan,
    TriSolvePlan,
    trisolve,
    trisolve_apply,
    trisolve_fixpoint_apply,
    trisolve_fixpoint_plan,
    trisolve_plan,
)
from .ilu import ilu0, ilu0_fixpoint_plans, ilu0_plans, ilu_apply
from .transpose_ops import csr_transpose_device, spmv_t, spmm_t
from .quantized import QuantizedCodebookDense, add_mat_mat_int8, quantize_codebook
from .add import SparseAddPlan, sparse_add, sparse_add_apply, sparse_add_plan
from .elementwise import scale, axpy_same_pattern, diagonal, frobenius_norm, with_data

__all__ = [
    "spmv",
    "prepare_spmv",
    "spmv_reference",
    "spmm",
    "spmm_reference",
    "spmm_right",
    "spmm_densify",
    "add_mat_mat",
    "SpGEMMPlan",
    "spgemm",
    "spgemm_densify",
    "spgemm_extract",
    "SpGEMMPacked",
    "spgemm_plan_packed",
    "spgemm_apply_packed",
    "spgemm_apply_packed_csc",
    "spgemm_apply",
    "spgemm_plan",
    "TriSolvePlan",
    "trisolve",
    "trisolve_apply",
    "trisolve_plan",
    "TriFixPlan",
    "trisolve_fixpoint_apply",
    "trisolve_fixpoint_plan",
    "ilu0",
    "ilu0_plans",
    "ilu0_fixpoint_plans",
    "ilu_apply",
    "spmv_t",
    "csr_transpose_device",
    "QuantizedCodebookDense",
    "add_mat_mat_int8",
    "quantize_codebook",
    "spmm_t",
    "scale",
    "axpy_same_pattern",
    "diagonal",
    "frobenius_norm",
    "with_data",
    "SparseAddPlan",
    "sparse_add",
    "sparse_add_apply",
    "sparse_add_plan",
]
