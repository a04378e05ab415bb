#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline = the reference's own benchmark workload (sparse AddMatMat,
m×n×k = 117×1023×2047, 25%-dense codebook-quantized B, fp32;
/root/reference/src/test/blas_test.cc:32) run through this framework's
jitted TPU path.  ``vs_baseline`` is the reference's published AVX2 figure
(~7.5 ms, kernel.cc:381) divided by our measured min time.
"""
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    from sparsematrix_tpu.bench.suite import bench_codebook_gemm

    # the fused Pallas kernel is the framework's recommended path for this
    # workload; the XLA comparison variants live in the full suite CLI
    rows = bench_codebook_gemm(check=True, variants=("fused-pallas",))
    # headline = fastest path that passes the reference's oracle check
    ok = [r for r in rows if r.checked] or rows
    r = min(ok, key=lambda r: r.result.min_ms)
    out = {
        "metric": "codebook_sparse_gemm_117x1023x2047_ms",
        "path": r.name,
        "value": round(r.result.min_ms, 4),
        "unit": "ms",
        "vs_baseline": round(r.extras["vs_baseline"], 2),
        "checked": r.checked,
        "nnz": r.nnz,
        "gnnz_per_s": round(r.nnz_per_s / 1e9, 3),
        "mean_ms": round(r.result.mean_ms, 4),
        "compile_ms": round(r.result.compile_ms, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
