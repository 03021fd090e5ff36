"""Tests for node-budget batching and host sharding."""

import numpy as np

from bio_diffusion_tpu.data.samplers import node_budget_batches, shard_indices


def test_node_budget_batches(rng):
    num_atoms = rng.integers(5, 30, size=100)
    budget = 256
    batches = list(node_budget_batches(num_atoms, budget, rng=rng))
    seen = np.concatenate(batches)
    assert sorted(seen) == list(range(100))  # exact cover, no dups
    for b in batches:
        padded = len(b) * num_atoms[b].max()
        assert padded <= budget or len(b) == 1


def test_node_budget_with_buckets(rng):
    num_atoms = rng.integers(5, 60, size=50)
    batches = list(node_budget_batches(num_atoms, 512, rng=rng, bucket_sizes=(32, 64)))
    for b in batches:
        bucket = 32 if num_atoms[b].max() <= 32 else 64
        assert len(b) * bucket <= 512 or len(b) == 1


def test_shard_indices_partition():
    shards = [
        shard_indices(103, epoch=2, seed=7, process_index=i, process_count=4)
        for i in range(4)
    ]
    allidx = np.concatenate(shards)
    assert len(allidx) == 100  # remainder dropped
    assert len(set(allidx.tolist())) == 100
    # same epoch+seed -> identical permutation across "hosts"
    again = shard_indices(103, epoch=2, seed=7, process_index=0, process_count=4)
    assert np.array_equal(shards[0], again)
    # different epoch -> different order
    other = shard_indices(103, epoch=3, seed=7, process_index=0, process_count=4)
    assert not np.array_equal(shards[0], other)
