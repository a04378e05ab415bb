"""Save/load sparse containers (npz), plus orbax checkpointing for
distributed state.

The reference's format has no disk serialization (SURVEY §5 — "Checkpoint /
resume: none"); distributed configs need restartable state, so every
container here round-trips through npz (single-host) or orbax (sharded).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..formats import BSR, COO, CSR, ELL, BlockedELL, CodebookCSR

_CLASSES = {c.__name__: c for c in (COO, CSR, BSR, ELL, BlockedELL, CodebookCSR)}

__all__ = ["save_npz", "load_npz", "save_checkpoint", "load_checkpoint"]


def save_npz(path: str, sp) -> None:
    cls = type(sp).__name__
    arrays = {}
    statics = {}
    for f in dataclasses.fields(sp):
        v = getattr(sp, f.name)
        if f.metadata.get("static", False):
            statics[f.name] = v
        elif v is not None:
            arrays[f.name] = np.asarray(v)
    np.savez_compressed(
        path,
        __class__=cls,
        __statics__=np.asarray(repr(statics), dtype=object),
        **arrays,
    )


def load_npz(path: str):
    import ast

    z = np.load(path, allow_pickle=True)
    cls = _CLASSES[str(z["__class__"])]
    statics = ast.literal_eval(str(z["__statics__"]))
    import jax.numpy as jnp

    kwargs = dict(statics)
    for f in dataclasses.fields(cls):
        if f.name in kwargs:
            continue
        kwargs[f.name] = jnp.asarray(z[f.name]) if f.name in z.files else None
    return cls(**kwargs)


def save_checkpoint(path: str, pytree) -> None:
    """Orbax checkpoint (works for sharded arrays across hosts)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, pytree)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, abstract_pytree):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, abstract_pytree)
