"""Production model serving for molecule generation.

The reference's inference surfaces are one-shot scripts (``src/
mol_gen_sample.py`` recompiles + reloads per invocation).  For production
deployment this module keeps one loaded checkpoint resident and serves
generation requests continuously:

  * **Warm executables** — the SegmentedSampler's compiled (init / segment
    scan / decode) executables persist across requests; ``warmup()``
    pre-compiles every configured (batch, bucket) shape so the first
    request is as fast as the thousandth.
  * **Request micro-batching, size-sorted** — concurrent requests are
    coalesced into fixed-shape device batches (per-molecule job
    granularity): the compiled shape is always ``(batch_size, bucket)``, so
    steady-state serving never recompiles regardless of request mix.  Each
    batch takes the LARGEST pending molecules (device cost scales ~N^2.2
    in the batch's padded bucket — BASELINE.md shape sweep), so under load
    every batch is full of size-adjacent molecules and the compiled bucket
    shrinks as the pool drains: the online equivalent of the eval
    protocol's globally-sorted bucketed sampling.  Jobs waiting longer
    than ``max_job_age_s`` are force-included (a smaller molecule rides
    any bucket for free), bounding queueing delay under a continuous
    stream of larger arrivals.
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

import bisect
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

# executor shutdown sentinel (distinct from any job)
_SHUTDOWN = object()


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
    t_enq: float = field(default_factory=time.time)
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
        of 2 up to the dataset max (matches the eval protocol's ladder
        granularity; jobs are batched size-affinely, see module docstring)
    num_timesteps : default denoising steps (None = the model's T)
    max_wait_ms : micro-batcher linger before running a partial batch
    max_job_age_s : queueing-delay bound — a job waiting this long is
        force-included in the next batch regardless of size ordering
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
        max_job_age_s: float = 30.0,
        mesh=None,
        seed: int = 0,
        segment_size: int = 250,
        max_request_mols: int = 10_000,
    ):
        self.dataset_info = ensure_bond_tables(dict(dataset_info))
        self.nodes_dist = nodes_dist
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self.max_job_age_s = float(max_job_age_s)
        self.default_T = num_timesteps
        max_n = int(dataset_info["max_n_nodes"])
        if buckets is None:
            # multiples of 2: device cost ~N^2.2 makes fine buckets worth
            # the extra compiles, and size-affine batching keeps each
            # bucket's batches full under load (BASELINE.md shape sweep)
            buckets = {min(b, max_n) for b in range(2, max_n + 2, 2)}
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
            "bucket_batches": {},  # bucket -> executed batch count
        }
        self._stats_lock = threading.Lock()
        self._executor = threading.Thread(target=self._run_loop, daemon=True)
        self._executor.start()

    # ------------------------------------------------------------- lifecycle
    def warmup(self, buckets: Optional[Sequence[int]] = None) -> List[int]:
        """Compile the serving shapes up front (per-bucket executables).

        One segment-length run per bucket compiles the same three
        executables (init / segment-scan / decode) as a full run — the
        scan shape is keyed by segment length, not step count — at a
        fraction of the device time."""
        T = self.default_T or int(self.sampler.evd.T)
        seg = self.sampler.segment_size
        # full-length chunk, plus the tail chunk when T % seg != 0
        warm_Ts = sorted({min(T, seg), T % seg or min(T, seg)})
        warmed = []
        for b in buckets if buckets is not None else self.buckets:
            mask = make_node_mask(np.full(self.batch_size, int(b)), int(b))
            for wT in warm_Ts:
                self.sampler.run(
                    jax.random.PRNGKey(0), jax.numpy.asarray(mask),
                    num_timesteps=wT,
                )
            warmed.append(int(b))
        log.info(f"Warmed serving buckets {warmed} at batch={self.batch_size}")
        return warmed

    def close(self):
        self._running = False
        self._queue.put(_SHUTDOWN)  # wake the executor
        self._executor.join(timeout=10)
        # fail any jobs still queued so blocked generate() callers return
        err = RuntimeError("server closed")
        while True:
            try:
                job = self._queue.get_nowait()
            except queue.Empty:
                break
            if job is not _SHUTDOWN and not job.done.is_set():
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
        # Size-SORTED micro-batcher.  Pending jobs are pooled per
        # num_timesteps, kept sorted by size (desc); a batch is the
        # ``batch_size`` LARGEST jobs of a pool, taken immediately when
        # they are bucket-coherent (a pure full batch) and otherwise when
        # the linger expires.  The batch's compiled bucket is set by its
        # largest molecule, and device cost scales ~N^2.2 in the bucket
        # (BASELINE.md shape sweep) — so under load every batch is 100%
        # occupied, carries size-adjacent molecules, and the per-batch
        # bucket shrinks as the pool drains: the online equivalent of the
        # eval protocol's globally-sorted bucketed sampling.  Jobs older
        # than max_job_age_s are force-included (a smaller molecule rides
        # any bucket for free), bounding worst-case queueing under a
        # continuous stream of larger arrivals.
        pending: Dict[Any, List[_Job]] = {}  # num_timesteps -> jobs, size-desc

        def take(T) -> List[_Job]:
            grp = pending.pop(T)
            if len(grp) <= self.batch_size:
                return grp
            now = time.time()
            forced = [j for j in grp if now - j.t_enq > self.max_job_age_s]
            if forced:
                grp = forced + [j for j in grp
                                if now - j.t_enq <= self.max_job_age_s]
            jobs, rest = grp[: self.batch_size], grp[self.batch_size:]
            if forced:
                rest.sort(key=lambda j: -j.size)  # restore the size order
            pending[T] = rest
            return jobs

        def coherent_full_pool():
            # a pool whose TOP batch_size jobs share one compiled bucket can
            # run immediately (a pure, full batch); anything else waits out
            # the linger — 5 ms against seconds-long batches is free, and
            # late arrivals can only improve the batch's composition
            for T, grp in pending.items():
                if len(grp) >= self.batch_size and _bucket_for(
                    grp[0].size, self.buckets
                ) == _bucket_for(grp[self.batch_size - 1].size, self.buckets):
                    return T
            return None

        def run_seeded(sj: _Job, local_ids: set):
            """Execute one seeded request exclusively (determinism
            contract).  Its group members were enqueued together; any not
            yet seen are pulled from the queue (other jobs are handed
            back), members already drained locally count as collected."""
            batch = [j for j in sj.group if not j.done.is_set()]
            remaining = {id(j) for j in batch} - {id(sj)} - local_ids
            deferred = []
            while remaining:
                nxt = self._queue.get()
                if nxt is _SHUTDOWN:
                    self._queue.put(_SHUTDOWN)  # keep the sentinel
                    break
                if id(nxt) in remaining:
                    remaining.discard(id(nxt))
                else:
                    deferred.append(nxt)  # not ours: hand back
            for d in deferred:
                self._queue.put(d)
            self._execute(batch, key=jax.random.PRNGKey(int(sj.seed)))

        shutdown = False
        while self._running and not shutdown:
            # 1) intake: block until the next item or the linger deadline of
            #    the oldest pending job, then drain everything already queued
            #    (a device execution takes seconds — without the full drain,
            #    jobs that queued up during it would dribble out one per
            #    iteration into under-filled "expired" batches)
            if pending:
                oldest = min(j.t_enq for grp in pending.values() for j in grp)
                timeout = max(0.0, oldest + self.max_wait_s - time.time())
            else:
                timeout = None
            items: List[Any] = []
            try:
                items.append(self._queue.get(timeout=timeout))
            except queue.Empty:
                pass  # linger expired
            while True:
                try:
                    items.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            seeded = [it for it in items
                      if it is not _SHUTDOWN and it.group is not None]
            local_ids = {id(s) for s in seeded}
            for it in items:
                if it is _SHUTDOWN:
                    shutdown = True
                elif it.group is None:
                    bisect.insort(
                        pending.setdefault(it.num_timesteps, []),
                        it, key=lambda j: -j.size,
                    )
            # 2) seeded requests run exclusively, as they arrive
            for sj in seeded:
                if sj.done.is_set():
                    continue
                try:
                    run_seeded(sj, local_ids)
                except BaseException as e:  # noqa: BLE001 — to the waiters
                    for j in sj.group:
                        if not j.done.is_set():
                            j.error = e
                            j.done.set()
            if shutdown:
                break
            # 3) run AT MOST ONE shared batch, then loop back to intake so
            #    arrivals during the device execution get drained first:
            #    a full pool immediately, else the pool holding the oldest
            #    job once its linger expires
            if not pending:
                continue
            # cross-pool aging: the max_job_age_s bound must hold globally,
            # not just within the pool being drained — under a sustained
            # stream of coherent same-bucket jobs at one num_timesteps, a
            # job in another pool would otherwise never be selected (the
            # oldest-pool rule below only fires when NO coherent full pool
            # exists).  If any pending job anywhere has aged out, run ITS
            # pool first; take() then force-includes it.
            now = time.time()
            aged = [(j.t_enq, T) for T, grp in pending.items() for j in grp
                    if now - j.t_enq > self.max_job_age_s]
            if aged:
                run_key = min(aged)[1]
            else:
                run_key = coherent_full_pool()
            if run_key is None:
                oldest_t = min(j.t_enq for grp in pending.values() for j in grp)
                if time.time() < oldest_t + self.max_wait_s:
                    continue  # keep filling
                run_key = min(
                    pending, key=lambda k: min(j.t_enq for j in pending[k])
                )
            batch = take(run_key)
            try:
                self._key, k = jax.random.split(self._key)
                self._execute(batch, key=k)
            except BaseException as e:  # noqa: BLE001 — to the waiters
                for j in batch:
                    if not j.done.is_set():
                        j.error = e
                        j.done.set()
        # shutdown: fail whatever is still pending so waiters return
        err = RuntimeError("server closed")
        for grp in pending.values():
            for j in grp:
                if not j.done.is_set():
                    j.error = err
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
            bb = self.stats["bucket_batches"]
            bb[bucket] = bb.get(bucket, 0) + 1

    # ----------------------------------------------------------------- intro
    def describe(self) -> Dict[str, Any]:
        with self._stats_lock:
            stats = dict(self.stats)
            stats["bucket_batches"] = dict(stats["bucket_batches"])
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
