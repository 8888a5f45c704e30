"""Shape-bucketed batching of ragged AMR boxes.

XLA wants static shapes and large batches; AMR gives ragged per-level box
shapes (the fixture mixes 16x32x64 and 8x4x2 at one level).  The plan here
flattens the reference's (t, level, component, box) iteration space
(iterator.h:25-33) into one work item per *(box, component)* pair — every
item is codec-independent (SURVEY.md §2: embarrassing parallelism) — then
buckets items by box shape into dense ``[N, X, Y, Z]`` batches, padding N up
to a multiple of the mesh size so the leading axis shards evenly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["WorkItem", "ShapeBatch", "plan_batches", "pad_to_multiple"]


@dataclass(frozen=True)
class WorkItem:
    """One (timestep, level, header-component-index, box-index) codec unit."""

    t: int
    level: int
    comp_idx: int     # plotfile-Header component index (file-name contract)
    box: int


@dataclass
class ShapeBatch:
    """A dense batch of same-shape items: ``data[i]`` belongs to ``items[i]``.

    ``n_valid`` <= N marks the unpadded prefix; padded rows are zeros and are
    ignored when unpacking results.
    """

    shape: tuple
    data: np.ndarray          # [N, X, Y, Z] float32
    items: list               # length n_valid
    n_valid: int


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m if m > 1 else n


def plan_batches(entries, pad_multiple: int = 1, max_batch_bytes: int = 1 << 30):
    """Group ``entries`` = iterable of (WorkItem, array[X,Y,Z] f32) into
    :class:`ShapeBatch` es.

    Batches are additionally split so no batch exceeds ``max_batch_bytes``
    (keeps HBM footprint bounded for huge runs); each split is still padded
    to ``pad_multiple`` (the mesh size).
    """
    buckets = {}
    for item, arr in entries:
        shape = tuple(arr.shape)
        buckets.setdefault(shape, []).append((item, arr))

    batches = []
    for shape in sorted(buckets, key=lambda s: (-int(np.prod(s)), s)):
        pairs = buckets[shape]
        per_item = int(np.prod(shape)) * 4
        chunk = max(pad_multiple, (max_batch_bytes // max(per_item, 1)) or 1)
        chunk = pad_to_multiple(chunk, pad_multiple) or pad_multiple
        for start in range(0, len(pairs), chunk):
            part = pairs[start : start + chunk]
            n = len(part)
            n_pad = pad_to_multiple(n, pad_multiple)
            data = np.zeros((n_pad,) + shape, dtype=np.float32)
            for i, (_item, arr) in enumerate(part):
                data[i] = arr
            batches.append(ShapeBatch(shape=shape, data=data,
                                      items=[it for it, _ in part], n_valid=n))
    return batches
