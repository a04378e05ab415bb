"""Run ONE bench group function directly (bypassing the CLI sweep) and
write rows in the CLI's JSON schema — for slow groups that need kwargs
the CLI doesn't expose (ilu_cg_xl variant subsets etc.).

Run: timeout 570 python benchmarks/run_group_json.py <group> <out.json> [k=v ...]
k=v values are parsed as python literals where possible.
"""
import ast
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sparsematrix_tpu.bench.suite import registry

group, out_path = sys.argv[1], sys.argv[2]
kwargs = {}
for kv in sys.argv[3:]:
    k, v = kv.split("=", 1)
    try:
        kwargs[k] = ast.literal_eval(v)
    except (ValueError, SyntaxError):
        kwargs[k] = v

fn = registry._benches[group]
rows = fn(**kwargs)
rows = rows if isinstance(rows, list) else [rows]
out = []
for r in rows:
    print(f"[row] {r.name} {r.shape} min={r.result.min_ms:.4f}ms "
          f"sol={r.sol_frac if r.sol_frac is None else f'{100*r.sol_frac:.1f}%'} "
          f"check={r.checked}", flush=True)
    out.append({
        "name": r.name, "shape": r.shape, "min_ms": r.result.min_ms,
        "mean_ms": r.result.mean_ms, "gnnz_per_s": r.nnz_per_s / 1e9,
        "sol_frac": r.sol_frac, "checked": r.checked, "nnz": r.nnz,
        **({"extras": r.extras} if getattr(r, "extras", None) else {}),
    })
json.dump(out, open(out_path, "w"), indent=1)
print(f"wrote {out_path}", flush=True)
