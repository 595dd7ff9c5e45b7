"""Pytree dataclass helper — the SoA record backbone.

The reference framework passes per-ray C++ structs (`Intersection`,
`BSDFQueryRecord`, `LuminaireSamplingRecord`; reference
include/mitsuba/render/shape.h:57, bsdf.h:154) through virtual calls.  Here
every record is a *batched struct-of-arrays pytree*: each field is a jnp array
with a leading wavefront axis, so records flow through jit/vmap/scan/shard_map
untouched.
"""
from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")


def pytree_dataclass(cls: T) -> T:
    """Decorate a class as a frozen dataclass registered as a JAX pytree.

    All fields are data (children). Use `static_field()` for aux data.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


def static_field(**kwargs):
    """A dataclass field treated as pytree aux data (must be hashable)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def replace(obj, **changes):
    """dataclasses.replace that works on pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
