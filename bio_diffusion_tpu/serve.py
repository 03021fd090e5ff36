"""Production model serving for molecule generation.

The reference's inference surfaces are one-shot scripts (``src/
mol_gen_sample.py`` recompiles + reloads per invocation).  For production
deployment this module keeps one loaded checkpoint resident and serves
generation requests continuously:

  * **Warm executables** — the SegmentedSampler's compiled (init / segment
    scan / decode) executables persist across requests; ``warmup()``
    pre-compiles every configured (batch, bucket) shape so the first
    request is as fast as the thousandth.
  * **Request micro-batching** — concurrent requests are coalesced into one
    fixed-shape device batch (per-molecule job granularity): the compiled
    shape is always ``(batch_size, bucket)``, so steady-state serving never
    recompiles regardless of request mix.
  * **One device executor thread** — transport threads enqueue jobs and
    wait on events; a single thread owns JAX dispatch (avoids interleaved
    dispatch from request handlers).
  * **Mesh-ready** — pass a mesh to shard serving batches over all local
    chips (the same data-parallel path as the inference CLIs).

Determinism contract: a request with an explicit ``seed`` is executed solo
(never coalesced with other requests) and draws its molecule sizes from the
request seed, so its molecules are fully reproducible; seedless requests
share batches and draw from the server RNG stream.

The HTTP front-end (stdlib ThreadingHTTPServer) lives in
``cli/serve.py``; this module is transport-agnostic.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from bio_diffusion_tpu.chem.stability import batch_molecular_stability, ensure_bond_tables
from bio_diffusion_tpu.train.sampling import SegmentedSampler, make_node_mask
from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _bucket_for(size: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if size <= b:
            return int(b)
    return int(buckets[-1])


@dataclass
class _Job:
    """One molecule to generate (a request fans out into jobs)."""

    size: int
    num_timesteps: Optional[int]
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict[str, Any]] = None
    error: Optional[BaseException] = None
    # set on every job of a seeded request: the whole request runs as one
    # exclusive batch keyed by PRNGKey(seed)
    seed: Optional[int] = None
    group: Optional[List["_Job"]] = None


class MoleculeServer:
    """Continuously serve molecule generation from one loaded checkpoint.

    Parameters
    ----------
    evd, params : the diffusion model (as returned by ``cli.common.load_model``)
    dataset_info : registry entry (atom decoder, bond tables, histograms)
    nodes_dist : NumNodesDistribution for requests without ``num_nodes``
    batch_size : fixed device batch — every executed batch has this shape
    buckets : node-count bucket ladder (compiled shapes); default: multiples
        of 4 up to the dataset max (same ladder as the eval protocol)
    num_timesteps : default denoising steps (None = the model's T)
    max_wait_ms : micro-batcher linger before running a partial batch
    mesh : optional device mesh for data-parallel serving
    """

    def __init__(
        self,
        evd,
        params,
        dataset_info: Dict[str, Any],
        nodes_dist,
        *,
        batch_size: int = 8,
        buckets: Optional[Sequence[int]] = None,
        num_timesteps: Optional[int] = None,
        max_wait_ms: float = 5.0,
        mesh=None,
        seed: int = 0,
        segment_size: int = 250,
        max_request_mols: int = 10_000,
    ):
        self.dataset_info = ensure_bond_tables(dict(dataset_info))
        self.nodes_dist = nodes_dist
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self.default_T = num_timesteps
        max_n = int(dataset_info["max_n_nodes"])
        if buckets is None:
            buckets = {min(b, max_n) for b in range(4, max_n + 4, 4)}
        self.buckets = sorted(int(b) for b in buckets)
        self.include_charges = getattr(evd.dataloader_cfg, "include_charges", True)

        self.sampler = SegmentedSampler(evd, params, segment_size=segment_size, mesh=mesh)
        self._rng = np.random.default_rng(seed)
        self._rng_lock = threading.Lock()  # generate() is called from transport threads
        self._key = jax.random.PRNGKey(seed)
        self.max_request_mols = int(max_request_mols)

        self._queue: "queue.Queue[_Job]" = queue.Queue()
        self._running = True
        self.stats: Dict[str, Any] = {
            "requests": 0, "molecules": 0, "batches": 0,
            "batched_jobs": 0, "device_s": 0.0, "started": time.time(),
        }
        self._stats_lock = threading.Lock()
        self._executor = threading.Thread(target=self._run_loop, daemon=True)
        self._executor.start()

    # ------------------------------------------------------------- lifecycle
    def warmup(self, buckets: Optional[Sequence[int]] = None) -> List[int]:
        """Compile the serving shapes up front (per-bucket executables)."""
        warmed = []
        for b in buckets if buckets is not None else self.buckets:
            mask = make_node_mask(np.full(self.batch_size, int(b)), int(b))
            self.sampler.run(
                jax.random.PRNGKey(0), jax.numpy.asarray(mask),
                num_timesteps=self.default_T,
            )
            warmed.append(int(b))
        log.info(f"Warmed serving buckets {warmed} at batch={self.batch_size}")
        return warmed

    def close(self):
        self._running = False
        self._queue.put(None)  # wake the executor
        self._executor.join(timeout=10)
        # fail any jobs still queued so blocked generate() callers return
        err = RuntimeError("server closed")
        while True:
            try:
                job = self._queue.get_nowait()
            except queue.Empty:
                break
            if job is not None and not job.done.is_set():
                job.error = err
                job.done.set()

    # --------------------------------------------------------------- serving
    def generate(
        self,
        num_samples: int,
        num_nodes: Optional[int] = None,
        num_timesteps: Optional[int] = None,
        seed: Optional[int] = None,
        timeout: Optional[float] = None,
    ) -> Dict[str, Any]:
        """Generate ``num_samples`` molecules; blocks until done.

        Thread-safe: concurrent callers' jobs are coalesced into shared
        device batches (unless ``seed`` is given — see module docstring).
        """
        t0 = time.time()
        num_samples = int(num_samples)
        if not 1 <= num_samples <= self.max_request_mols:
            raise ValueError(
                f"num_samples must be in [1, {self.max_request_mols}], got {num_samples}"
            )
        if num_nodes:
            if int(num_nodes) > self.buckets[-1]:
                raise ValueError(
                    f"num_nodes={num_nodes} exceeds the largest compiled "
                    f"bucket ({self.buckets[-1]})"
                )
            sizes = np.full(num_samples, int(num_nodes), dtype=np.int64)
        elif seed is not None:
            # seeded requests must be fully reproducible: sizes come from the
            # request seed, not the shared (traffic-dependent) server stream
            sizes = self.nodes_dist.sample(num_samples, np.random.default_rng(seed))
        else:
            with self._rng_lock:
                sizes = self.nodes_dist.sample(num_samples, self._rng)
        # distribution-drawn size can exceed the largest compiled bucket
        # when the server was configured with a partial ladder
        sizes = np.minimum(sizes, self.buckets[-1])
        T = int(num_timesteps) if num_timesteps else self.default_T
        jobs = [_Job(size=int(s), num_timesteps=T, seed=seed) for s in sizes]
        if seed is not None:
            for j in jobs:
                j.group = jobs
        for j in jobs:
            self._queue.put(j)
        mols = []
        for j in jobs:
            if not j.done.wait(timeout):
                raise TimeoutError("generation timed out")
            if j.error is not None:
                raise j.error
            mols.append(j.result)
        with self._stats_lock:
            self.stats["requests"] += 1
            self.stats["molecules"] += len(mols)
        return {
            "molecules": mols,
            "num_molecules": len(mols),
            "mol_stable_frac": float(np.mean([m["stable"] for m in mols])) if mols else 0.0,
            "elapsed_s": round(time.time() - t0, 4),
        }

    # -------------------------------------------------------------- executor
    def _run_loop(self):
        while self._running:
            job = self._queue.get()
            if job is None:
                continue
            batch = [job]
            try:
                if job.group is not None:
                    # seeded request: collect exactly its own jobs (they were
                    # enqueued together; drain the rest from the queue)
                    batch = [j for j in job.group if not j.done.is_set()]
                    remaining = set(id(j) for j in batch if j is not job)
                    deferred = []
                    while remaining:
                        nxt = self._queue.get()
                        if nxt is None:
                            self._queue.put(None)  # keep the shutdown sentinel
                            break
                        if id(nxt) in remaining:
                            remaining.discard(id(nxt))
                        else:
                            deferred.append(nxt)  # not ours: hand back after
                    for d in deferred:
                        self._queue.put(d)
                    self._execute(batch, key=jax.random.PRNGKey(int(job.seed)))
                    continue
                # micro-batch: linger up to max_wait_s for co-batchable jobs;
                # non-co-batchable jobs (other T / seeded) are set aside, not
                # a reason to stop filling the batch
                deadline = time.time() + self.max_wait_s
                deferred = []
                while len(batch) < self.batch_size:
                    t_left = deadline - time.time()
                    if t_left <= 0:
                        break
                    try:
                        nxt = self._queue.get(timeout=t_left)
                    except queue.Empty:
                        break
                    if nxt is None:
                        self._queue.put(None)
                        break
                    if nxt.group is not None or nxt.num_timesteps != job.num_timesteps:
                        deferred.append(nxt)
                        continue
                    batch.append(nxt)
                for d in deferred:
                    self._queue.put(d)
                self._key, k = jax.random.split(self._key)
                self._execute(batch, key=k)
            except BaseException as e:  # noqa: BLE001 — propagate to waiters
                for j in batch:
                    if not j.done.is_set():
                        j.error = e
                        j.done.set()

    def _execute(self, jobs: List[_Job], key):
        """Run one fixed-shape device batch covering ``jobs``."""
        # chunk seeded requests larger than the device batch
        for start in range(0, len(jobs), self.batch_size):
            chunk = jobs[start: start + self.batch_size]
            self._execute_chunk(chunk, jax.random.fold_in(key, start))

    def _execute_chunk(self, jobs: List[_Job], key):
        sizes = [j.size for j in jobs]
        bucket = _bucket_for(max(sizes), self.buckets)
        # pad the batch dim with copies of the last size so the compiled
        # shape is always (batch_size, bucket); extras are discarded
        padded = sizes + [sizes[-1]] * (self.batch_size - len(sizes))
        mask = jax.numpy.asarray(make_node_mask(np.asarray(padded), bucket))
        t0 = time.time()
        xh = self.sampler.run(key, mask, num_timesteps=jobs[0].num_timesteps)
        device_s = time.time() - t0
        mask_np = np.asarray(mask)
        k = len(self.dataset_info["atom_decoder"])
        atom_types = xh[..., 3: 3 + k].argmax(-1)
        mol_stable, _, _ = batch_molecular_stability(
            xh[..., :3], atom_types, mask_np, self.dataset_info
        )
        decoder = self.dataset_info["atom_decoder"]
        for i, j in enumerate(jobs):
            m = mask_np[i] > 0
            types = atom_types[i][m]
            result = {
                "atoms": [decoder[int(t)] for t in types],
                "positions": np.round(xh[i, :, :3][m], 6).tolist(),
                "size": int(m.sum()),
                "stable": bool(mol_stable[i]),
            }
            if self.include_charges:
                result["charges"] = np.round(xh[i, :, 3 + k][m]).astype(int).tolist()
            j.result = result
            j.done.set()
        with self._stats_lock:
            self.stats["batches"] += 1
            self.stats["batched_jobs"] += len(jobs)
            self.stats["device_s"] += device_s

    # ----------------------------------------------------------------- intro
    def describe(self) -> Dict[str, Any]:
        with self._stats_lock:
            stats = dict(self.stats)
        stats["uptime_s"] = round(time.time() - stats.pop("started"), 1)
        stats["avg_batch_occupancy"] = round(
            stats["batched_jobs"] / max(stats["batches"], 1), 3
        )
        return {
            "status": "ok",
            "device": str(jax.devices()[0]),
            "batch_size": self.batch_size,
            "buckets": self.buckets,
            "default_num_timesteps": self.default_T or int(self.sampler.evd.T),
            "stats": stats,
        }
