"""Checkpoint / resume: scene + parameter + film state serialization.

Capability parity (and beyond) for the reference's persistence machinery:
  * Scene/mesh binary serialization (trimesh.h:192-201 zlib `.serialized`
    dumps, `InstanceManager` object graphs, serialization.h:33) → any
    pytree (Scene, MediumTable, optimizer params) round-trips through a
    single compressed npz;
  * mid-render resume (the reference only offers `-x` whole-scene skip and
    SIGHUP partial-film flush, mitsuba.cpp:81-110) → films checkpoint as
    (sum, count) pairs so accumulation continues exactly where it stopped.
"""
from __future__ import annotations

import io
import zlib

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Serialize any pytree of arrays (+ static aux data) to one file."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    buf = io.BytesIO()
    np.savez(buf, *[np.asarray(l) for l in leaves],
             __treedef__=np.frombuffer(repr(treedef).encode(), np.uint8))
    with open(path, "wb") as f:
        f.write(zlib.compress(buf.getvalue(), 6))


def load_pytree(path: str, like):
    """Load arrays saved by save_pytree into the structure of `like`.

    `like` supplies the pytree structure + static fields (the analog of the
    reference's by-name Class instantiation during unserialization)."""
    with open(path, "rb") as f:
        raw = zlib.decompress(f.read())
    data = np.load(io.BytesIO(raw))
    leaves, treedef = jax.tree_util.tree_flatten(like)
    arrays = [data[f"arr_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, arrays)


class FilmCheckpoint:
    """Accumulating film that survives interruption (sum + spp count)."""

    def __init__(self, height: int, width: int):
        self.sum = np.zeros((height, width, 3), np.float64)
        self.count = 0

    def add_pass(self, img, spp: int):
        self.sum += np.asarray(img, np.float64) * spp
        self.count += spp

    @property
    def image(self):
        return (self.sum / max(self.count, 1)).astype(np.float32)

    def save(self, path: str):
        np.savez_compressed(path, sum=self.sum, count=self.count)

    @staticmethod
    def load(path: str) -> "FilmCheckpoint":
        data = np.load(path)
        fc = FilmCheckpoint(*data["sum"].shape[:2])
        fc.sum = data["sum"]
        fc.count = int(data["count"])
        return fc
