"""Node-count / property / categorical distributions used by the DDPM.

Behavioral counterparts of NumNodesDistribution / PropertiesDistribution /
CategoricalDistribution (reference src/models/__init__.py:264-439), with
device-friendly table lookups where the sampler needs them.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


class NumNodesDistribution:
    """Categorical over molecule sizes from a dataset histogram.

    ``sample`` is host-side numpy (it feeds static bucket selection);
    ``log_prob_table`` is an array indexed by n for device-side log p(N).
    """

    def __init__(self, histogram: Dict[int, int], eps: float = 1e-30):
        self.eps = eps
        nodes = np.array(sorted(int(k) for k in histogram), dtype=np.int64)
        counts = np.array([histogram[int(n)] for n in nodes], dtype=np.float64)
        self.num_nodes = nodes
        self.prob = counts / counts.sum()
        self.max_n = int(nodes.max())
        # dense table over 0..max_n: log prob of each node count ((-inf)->log(eps))
        table = np.full(self.max_n + 1, eps, dtype=np.float64)
        table[nodes] = self.prob + eps
        self.log_prob_table = np.log(table).astype(np.float32)

    def sample(self, n_samples: int, rng: np.random.Generator) -> np.ndarray:
        idx = rng.choice(len(self.num_nodes), size=n_samples, p=self.prob)
        return self.num_nodes[idx]

    def log_prob(self, batch_n_nodes: np.ndarray) -> np.ndarray:
        return self.log_prob_table[np.asarray(batch_n_nodes, dtype=np.int64)]

    def entropy(self) -> float:
        return float(np.sum(self.prob * np.log(self.prob + self.eps)))


class PropertiesDistribution:
    """Per-node-count histograms of conditioning property values.

    Counterpart of reference PropertiesDistribution (models/__init__.py:311-415):
    1000-bin histograms per n_nodes; sampling draws a bin then uniform within.
    """

    def __init__(
        self,
        num_atoms: np.ndarray,
        properties: Dict[str, np.ndarray],
        num_bins: int = 1000,
        normalizer: Optional[Dict[str, Dict[str, float]]] = None,
    ):
        self.properties = list(properties.keys())
        self.num_bins = num_bins
        self.normalizer = normalizer
        self.distributions: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
        num_atoms = np.asarray(num_atoms)
        for prop, values in properties.items():
            values = np.asarray(values, dtype=np.float64)
            self.distributions[prop] = {}
            for n in range(int(num_atoms.min()), int(num_atoms.max()) + 1):
                vals = values[num_atoms == n]
                if len(vals) == 0:
                    continue
                probs, params = self._probs_given_nodes(vals)
                self.distributions[prop][n] = {"probs": probs, "params": params}

    def _probs_given_nodes(self, values: np.ndarray, eps: float = 1e-12):
        prop_min, prop_max = values.min(), values.max()
        prop_range = prop_max - prop_min + eps
        idx = ((values - prop_min) / prop_range * self.num_bins).astype(np.int64)
        idx = np.minimum(idx, self.num_bins - 1)
        hist = np.bincount(idx, minlength=self.num_bins).astype(np.float64)
        return hist / hist.sum(), (prop_min, prop_max)

    def set_normalizer(self, normalizer: Dict[str, Dict[str, float]]):
        self.normalizer = normalizer

    def normalize(self, value: np.ndarray, prop: str) -> np.ndarray:
        assert self.normalizer is not None
        return (value - self.normalizer[prop]["mean"]) / self.normalizer[prop]["mad"]

    def sample(self, num_nodes: int, rng: np.random.Generator) -> np.ndarray:
        vals = []
        for prop in self.properties:
            dist = self.distributions[prop][int(num_nodes)]
            idx = rng.choice(self.num_bins, p=dist["probs"])
            prop_min, prop_max = dist["params"]
            prop_range = prop_max - prop_min
            left = idx / self.num_bins * prop_range + prop_min
            right = (idx + 1) / self.num_bins * prop_range + prop_min
            val = rng.uniform(left, right)
            vals.append(self.normalize(val, prop))
        return np.array(vals, dtype=np.float32)

    def sample_batch(self, num_nodes: Sequence[int], rng: np.random.Generator) -> np.ndarray:
        return np.stack([self.sample(int(n), rng) for n in num_nodes], axis=0)


class CategoricalDistribution:
    """Atom-type marginal; KL(data || samples) diagnostic
    (reference models/__init__.py:418-439)."""

    EPS = 1e-10

    def __init__(self, histogram_dict: Dict[int, int], mapping: Dict[str, int]):
        histogram = np.zeros(len(mapping))
        for k, v in histogram_dict.items():
            histogram[int(k)] = v
        self.p = histogram / histogram.sum()
        self.mapping = mapping

    def kl_divergence(self, other_samples: List[int]) -> float:
        sample_histogram = np.zeros(len(self.mapping))
        for x in other_samples:
            sample_histogram[int(x)] += 1
        q = sample_histogram / max(sample_histogram.sum(), 1)
        return float(-np.sum(self.p * np.log(q / self.p + self.EPS)))


def compute_mean_mad(values: np.ndarray) -> Dict[str, float]:
    """Mean and mean-absolute-deviation normalizer for one property
    (reference compute_mean_mad_from_dataloader, models/__init__.py:62-76)."""
    values = np.asarray(values, dtype=np.float64)
    mean = values.mean()
    mad = np.abs(values - mean).mean()
    return {"mean": float(mean), "mad": float(mad)}
