"""Dense molecule batches: the TPU-native replacement for PyG Batch.

A ``DenseMolBatch`` is a pytree of statically-shaped padded tensors — the
whole framework's data contract.  Collation pads every molecule to a bucket
size (QM9: one bucket at max_n_nodes=29 or a rounded-up size; GEOM: a ladder
of buckets) so XLA compiles once per bucket instead of once per shape.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np
from flax import struct


@struct.dataclass
class DenseMolBatch:
    """Statically-shaped molecule batch.

    Fields:
      x:         [B, N, 3] positions (padded rows exactly 0)
      one_hot:   [B, N, K] atom-type one-hot (float)
      charges:   [B, N, 1] atomic numbers (float; zeros when unused)
      node_mask: [B, N] 0/1 float
      context:   [B, N, C] per-node conditioning features, or None
    """

    x: jax.Array
    one_hot: jax.Array
    charges: jax.Array
    node_mask: jax.Array
    context: Optional[jax.Array] = None

    @property
    def num_graphs(self) -> int:
        return self.x.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.x.shape[1]


def round_up(n: int, multiple: int) -> int:
    if multiple <= 1:
        return n
    return ((n + multiple - 1) // multiple) * multiple


def select_bucket(max_nodes: int, bucket_sizes: Optional[Sequence[int]], pad_to_multiple: int = 1) -> int:
    """Pick the padded node count for a batch."""
    if bucket_sizes:
        for b in sorted(bucket_sizes):
            if max_nodes <= b:
                return b
        return max(bucket_sizes)
    return round_up(max_nodes, pad_to_multiple)


def collate_dense(
    positions: Sequence[np.ndarray],
    one_hot: Sequence[np.ndarray],
    charges: Optional[Sequence[np.ndarray]],
    pad_to: int,
    context: Optional[np.ndarray] = None,
) -> DenseMolBatch:
    """Pad a list of per-molecule arrays into a DenseMolBatch.

    ``context`` is per-graph [B, C] and is broadcast to nodes (masked),
    matching the reference's prepare_context (edm/utils.py:332-382).
    """
    b = len(positions)
    k = one_hot[0].shape[-1]
    x = np.zeros((b, pad_to, 3), dtype=np.float32)
    oh = np.zeros((b, pad_to, k), dtype=np.float32)
    ch = np.zeros((b, pad_to, 1), dtype=np.float32)
    mask = np.zeros((b, pad_to), dtype=np.float32)
    for i, (p, o) in enumerate(zip(positions, one_hot)):
        n = len(p)
        x[i, :n] = p
        oh[i, :n] = o
        mask[i, :n] = 1.0
        if charges is not None:
            ch[i, :n, 0] = np.asarray(charges[i]).reshape(-1)[:n]
    ctx = None
    if context is not None:
        context = np.asarray(context, dtype=np.float32)
        ctx = np.broadcast_to(context[:, None, :], (b, pad_to, context.shape[-1])).copy()
        ctx *= mask[..., None]
    return DenseMolBatch(x=x, one_hot=oh, charges=ch, node_mask=mask, context=ctx)


class DenseDataset:
    """In-memory dense dataset: dict of [M, Nmax(, .)] arrays.

    The QM9 npz layout is already molecule-padded, so this is a thin wrapper
    holding positions [M, Nmax, 3], charges [M, Nmax], one_hot [M, Nmax, K],
    num_atoms [M], and any scalar property columns.
    """

    def __init__(self, data: Dict[str, np.ndarray], included_species: np.ndarray):
        self.data = data
        self.included_species = np.asarray(included_species)

    def __len__(self) -> int:
        return len(self.data["num_atoms"])

    @property
    def num_species(self) -> int:
        return len(self.included_species)

    @property
    def max_charge(self) -> int:
        return int(self.included_species.max())

    def property_values(self, key: str) -> np.ndarray:
        return self.data[key]

    def stats(self) -> Dict[str, Tuple[float, float]]:
        out = {}
        for key, val in self.data.items():
            val = np.asarray(val)
            if val.ndim == 1 and np.issubdtype(val.dtype, np.floating):
                out[key] = (float(val.mean()), float(val.std()))
        return out


def iterate_dense_batches(
    dataset: DenseDataset,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_last: bool = True,
    pad_to: Optional[int] = None,
    pad_to_multiple: int = 1,
    bucket_sizes: Optional[Sequence[int]] = None,
    conditioning: Sequence[str] = (),
    property_norms: Optional[Dict[str, Dict[str, float]]] = None,
) -> Iterator[DenseMolBatch]:
    """Yield DenseMolBatch objects from a DenseDataset.

    With ``bucket_sizes`` / ``pad_to_multiple``, each batch is padded only to
    its bucket size — batches of mostly-small molecules run cheaper, and XLA
    caches one executable per bucket.
    """
    m = len(dataset)
    idx = np.arange(m)
    if shuffle:
        assert rng is not None, "shuffle requires an rng"
        rng.shuffle(idx)
    positions = dataset.data["positions"]
    charges = dataset.data["charges"]
    one_hot = dataset.data["one_hot"]

    use_native = False
    try:
        from bio_diffusion_tpu.data.native_loader import collate_dense_native, native_available

        use_native = native_available()
    except Exception:
        pass

    for start in range(0, m, batch_size):
        sel = idx[start: start + batch_size]
        if len(sel) < batch_size and drop_last:
            break
        num_atoms = dataset.data["num_atoms"][sel]
        n_pad = pad_to if pad_to is not None else select_bucket(
            int(num_atoms.max()), bucket_sizes, pad_to_multiple
        )
        b = len(sel)
        native = None
        if use_native:
            native = collate_dense_native(
                positions, charges, sel, n_pad, dataset.included_species
            )
        if native is not None:
            x, oh, ch2, mask = native
            ch = ch2[..., None]
        else:
            x = np.zeros((b, n_pad, 3), dtype=np.float32)
            oh = np.zeros((b, n_pad, one_hot.shape[-1]), dtype=np.float32)
            ch = np.zeros((b, n_pad, 1), dtype=np.float32)
            mask = np.zeros((b, n_pad), dtype=np.float32)
            src_n = min(n_pad, positions.shape[1])
            x[:, :src_n] = positions[sel][:, :src_n]
            oh[:, :src_n] = one_hot[sel][:, :src_n]
            ch[:, :src_n, 0] = charges[sel][:, :src_n]
            node_present = (charges[sel][:, :src_n] > 0).astype(np.float32)
            mask[:, :src_n] = node_present
            # zero out padded coordinate rows (missing nodes carry no geometry)
            x *= mask[..., None]
            oh *= mask[..., None]

        ctx = None
        if conditioning:
            assert property_norms is not None
            cols = []
            for prop in conditioning:
                v = dataset.data[prop][sel].astype(np.float32)
                norms = property_norms[prop]
                cols.append((v - norms["mean"]) / norms["mad"])
            ctx = np.stack(cols, axis=-1)  # [B, C]
            ctx = np.broadcast_to(ctx[:, None, :], (b, n_pad, ctx.shape[-1])).copy()
            ctx *= mask[..., None]

        yield DenseMolBatch(x=x, one_hot=oh, charges=ch, node_mask=mask, context=ctx)
