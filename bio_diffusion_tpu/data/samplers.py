"""Batch samplers: node-budget packing + multi-host sharding.

Counterparts of the reference's src/datamodules/components/sampler.py:
``BatchSampler`` (pack examples until a node budget is reached) and
``DistributedSamplerWrapper`` (shard any sampler across DDP ranks).  Here:

  * :func:`node_budget_batches` packs molecule indices into batches bounded
    by a total-node budget — with dense padding, the budget bounds the
    padded batch area (B x N_bucket), keeping per-batch compute uniform.
  * :func:`shard_indices` deterministically splits an epoch's index order
    across hosts (jax.process_index/count) — the host-sharded input
    pipeline replacing DistributedSamplerWrapper (each host feeds its local
    devices; the mesh handles gradient reduction).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np


def node_budget_batches(
    num_atoms: np.ndarray,
    max_nodes_per_batch: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    bucket_sizes: Optional[Sequence[int]] = None,
) -> Iterator[np.ndarray]:
    """Yield index batches whose padded node area stays within budget.

    With ``bucket_sizes``, the cost of a batch is B * bucket(N_max) — the
    actual padded compute — otherwise B * max(num_atoms in batch).
    """
    from bio_diffusion_tpu.data.batch import select_bucket

    m = len(num_atoms)
    order = np.arange(m)
    if shuffle:
        assert rng is not None
        rng.shuffle(order)

    batch: List[int] = []
    cur_max = 0
    for idx in order:
        n = int(num_atoms[idx])
        new_max = max(cur_max, n)
        padded = select_bucket(new_max, bucket_sizes) if bucket_sizes else new_max
        if batch and (len(batch) + 1) * padded > max_nodes_per_batch:
            yield np.asarray(batch)
            batch, cur_max = [], 0
            new_max = n
        batch.append(int(idx))
        cur_max = max(cur_max, n)
    if batch:
        yield np.asarray(batch)


def shard_indices(
    num_examples: int,
    epoch: int,
    seed: int = 0,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    shuffle: bool = True,
    drop_remainder: bool = True,
) -> np.ndarray:
    """This host's deterministic shard of the epoch's example order.

    All hosts compute the same permutation (seed + epoch) and take disjoint
    strided slices, so global coverage is exact without communication.
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count

    order = np.arange(num_examples)
    if shuffle:
        np.random.default_rng(np.random.SeedSequence([seed, epoch])).shuffle(order)
    if drop_remainder:
        usable = (num_examples // pc) * pc
        order = order[:usable]
    return order[pi::pc]
