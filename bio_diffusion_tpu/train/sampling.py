"""Host-side sampling drivers: segmented reverse diffusion + analysis.

Task-level counterparts of the reference Lightning module's sampling APIs
(qm9_mol_gen_ddpm.py: sample :589, sample_and_analyze :745, analyze_samples
:845, generate_molecules :1062), built on the EVD's jitted segment/decode
methods.  Segmenting the 1000-step scan into chunks keeps each device
execution short (remote-runtime friendly) with negligible overhead.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bio_diffusion_tpu.chem.stability import batch_molecular_stability, ensure_bond_tables
from bio_diffusion_tpu.models.distributions import CategoricalDistribution, NumNodesDistribution


class FunctionDynamics:
    """Parameter-free flax module wrapping a pure dynamics function.

    Used by the fast inference path: the function closes over the weight
    arrays (they become jit constants), so the wrapping EVD applies with an
    empty variables dict.
    """

    def __new__(cls, fn):
        from flax import linen as nn

        class _FunctionDynamics(nn.Module):
            @nn.compact
            def __call__(self, z, t, node_mask, context=None, xh_self_cond=None,
                         deterministic=True):
                return fn(z, t, node_mask, context=context, xh_self_cond=xh_self_cond)

        return _FunctionDynamics()


def build_fast_evd(evd, params, interpret: bool = False, mesh=None):
    """Clone the EVD with its dynamics replaced by the baked-weight
    pure-function fast path (models/gcpnet_fast.py) when the configuration
    supports it; the clone applies with an EMPTY variables dict.  Returns
    None when the fast path doesn't apply (non-GCPNet dynamics or
    unsupported module options).  A LEARNED noise schedule is supported by
    freezing the GammaNetwork into a gamma(k/T) lookup table
    (gamma_table_override).  ``mesh``: multi-chip data-parallel sampling —
    the Pallas kernel runs per-shard under shard_map (see
    make_fast_dynamics)."""
    from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
    from bio_diffusion_tpu.models.gcpnet_fast import make_fast_dynamics, supports_fast_path

    dyn = evd.dynamics
    if not isinstance(dyn, GCPNetDynamics):
        return None
    if not supports_fast_path(dyn.module_cfg, dyn.layer_cfg):
        return None
    gamma_override = None
    if evd.diffusion_cfg.noise_schedule == "learned":
        # freeze the learned GammaNetwork into a gamma(k/T) lookup table:
        # sampling only queries gamma on the k/T grid, so the baked clone
        # (which applies with EMPTY params) samples identically
        t_grid = jnp.arange(evd.T + 1, dtype=jnp.float32)[:, None] / evd.T
        gamma_override = evd.apply(params, t_grid, method=evd.gamma)[:, 0]

    on_tpu = jax.devices()[0].platform == "tpu"
    fwd = make_fast_dynamics(
        dyn.model_cfg, dyn.module_cfg, dyn.layer_cfg, dyn.diffusion_cfg,
        dyn.dataloader_cfg, params,
        compute_dtype=dyn.compute_dtype,
        use_pallas=on_tpu or interpret,
        interpret=interpret,
        mesh=mesh,
    )
    return evd.clone(dynamics=FunctionDynamics(fwd),
                     gamma_table_override=gamma_override)


class SegmentedSampler:
    """Jit-compiled segmented reverse-diffusion sampler for one EVD model.

    Compiles three executables (init noise, one segment scan, decode) per
    (batch, nodes) shape; reuses them across calls.

    ``fast='auto'`` switches to the pure-function + Pallas-kernel forward
    (models/gcpnet_fast.py) when the model configuration supports it; the
    weights are baked as constants, so build one sampler per weight set.

    ``mesh``: multi-chip data-parallel sampling.  Batch inputs are
    device_put with the batch sharding, GSPMD partitions the scan body over
    the 'data' axis, and the Pallas kernel runs per-shard under shard_map
    (batches not divisible by the data axis dispatch to the partitionable
    packed-XLA layer).  The reference has no inference scale-out at all
    (single-GPU sampling, src/mol_gen_sample.py).

    NOTE: ``params`` must be created via ``evd.init`` on a path that calls
    the dynamics network OUTSIDE lax.scan (the default ``__call__``/loss
    path, or the dynamics module directly) — initializing through
    ``mol_gen_sample`` would run flax initializers inside the scan trace.
    """

    def __init__(self, evd, params, segment_size: int = 200, fast: str = "auto",
                 interpret: bool = False, mesh=None):
        self.evd = evd
        self.params = params
        self.segment_size = segment_size
        self.self_condition = evd.diffusion_cfg.self_condition
        self.mesh = mesh

        if fast in ("auto", True, "on"):
            fast_evd = self._try_build_fast(evd, params, interpret, mesh)
            if fast_evd is not None:
                self.evd = fast_evd
                self.params = {}

        evd = self.evd
        self._init_fn = jax.jit(
            lambda p, k, m, fix: evd.apply(p, k, m, fix, method=evd.init_sample_noise),
            static_argnums=(3,),
        )
        self._segment_fn = jax.jit(
            lambda p, z, sc, k, sv, tv, m, ctx, fix, fix_sc: evd.apply(
                p, z, sc, k, sv, tv, m, ctx, fix, fix_sc, method=evd.reverse_segment
            ),
            static_argnums=(8, 9),
        )
        self._decode_fn = jax.jit(
            lambda p, z, sc, k, m, ctx, fix: evd.apply(
                p, z, sc, k, m, ctx, fix, method=evd.decode_sample
            ),
            static_argnums=(6,),
        )

    @staticmethod
    def _try_build_fast(evd, params, interpret: bool, mesh=None):
        return build_fast_evd(evd, params, interpret=interpret, mesh=mesh)

    def run(
        self,
        key,
        node_mask: jnp.ndarray,
        num_timesteps: Optional[int] = None,
        context: Optional[jnp.ndarray] = None,
        z_init: Optional[jnp.ndarray] = None,
        start_step: Optional[int] = None,
        fix_noise: bool = False,
        norm_with_original_timesteps: bool = False,
    ) -> np.ndarray:
        """Sample xh [B, N, 3+F] on the data scale.

        ``z_init``/``start_step`` support the optimization round-trip: start
        from an existing normalized z at step ``start_step`` instead of noise.
        """
        evd = self.evd
        T_s = evd.T if num_timesteps is None else num_timesteps
        denom = float(evd.T if norm_with_original_timesteps else T_s)
        fix_sc = fix_noise if self.self_condition else False

        b_orig = node_mask.shape[0]
        if self.mesh is not None:
            # shard the batch over the data axis; GSPMD partitions
            # everything downstream from these input shardings.  Batches
            # not divisible by the data axis are PADDED with copies of the
            # first molecule (sliced off at the end), so sharding — and the
            # per-shard Pallas kernel — is kept for every batch size, not
            # just multiples of the device count.
            from bio_diffusion_tpu.parallel.mesh import batch_sharding

            dp = int(self.mesh.shape["data"])
            pad = (-b_orig) % dp

            def pad_rows(a):
                if pad == 0 or a is None:
                    return a
                reps = (pad,) + (1,) * (a.ndim - 1)
                return jnp.concatenate([a, jnp.tile(a[:1], reps)], axis=0)

            node_mask = pad_rows(node_mask)
            context = pad_rows(context)
            z_init = pad_rows(z_init)

            bs = batch_sharding(self.mesh)
            node_mask = jax.device_put(node_mask, bs)
            if context is not None:
                context = jax.device_put(context, bs)
            if z_init is not None:
                z_init = jax.device_put(z_init, bs)
            leaves = jax.tree.leaves(self.params)
            if leaves:
                # non-baked paths: params must live on the mesh's device set
                # (jit refuses mixed placements).  Params already on the mesh
                # (e.g. the Trainer's FSDP-sharded EMA params) are left as-is.
                cur = getattr(leaves[0], "sharding", None)
                on_mesh = cur is not None and set(cur.device_set) == set(
                    self.mesh.devices.flat
                )
                if not on_mesh:
                    from jax.sharding import NamedSharding, PartitionSpec

                    self.params = jax.device_put(
                        self.params, NamedSharding(self.mesh, PartitionSpec())
                    )

        key, k_init = jax.random.split(key)
        if z_init is None:
            z = self._init_fn(self.params, k_init, node_mask, fix_noise)
            start = T_s - 1
        else:
            z = z_init
            start = (start_step if start_step is not None else T_s) - 1

        self_cond = jnp.zeros_like(z) if self.self_condition else None
        s_values = np.arange(start, -1, -1, dtype=np.float32)
        for seg_start in range(0, len(s_values), self.segment_size):
            seg = s_values[seg_start: seg_start + self.segment_size]
            key, k_seg = jax.random.split(key)
            z, self_cond, _ = self._segment_fn(
                self.params, z, self_cond, k_seg,
                jnp.asarray(seg / denom), jnp.asarray((seg + 1) / denom),
                node_mask, context, fix_noise, fix_sc,
            )

        key, k_dec = jax.random.split(key)
        fix_final = fix_sc if self.self_condition else fix_noise
        xh = self._decode_fn(self.params, z, self_cond, k_dec, node_mask, context, fix_final)
        return np.asarray(xh)[:b_orig]


def make_node_mask(num_nodes: Sequence[int], pad_to: Optional[int] = None) -> np.ndarray:
    num_nodes = np.asarray(num_nodes)
    n = int(pad_to if pad_to is not None else num_nodes.max())
    return (np.arange(n)[None, :] < num_nodes[:, None]).astype(np.float32)


def sample_molecules(
    sampler: SegmentedSampler,
    key,
    num_samples: int,
    nodes_dist: NumNodesDistribution,
    rng: np.random.Generator,
    batch_size: int = 100,
    pad_to: Optional[int] = None,
    num_timesteps: Optional[int] = None,
    props_distr=None,
    context_fn=None,
    bucket_sizes: Optional[Sequence[int]] = None,
    pad_to_multiple: int = 2,
    sort_sizes: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sample molecules in batches -> (xh [M, N, .], node_mask [M, N], num_nodes [M]).

    By default all molecule sizes are drawn up front, sorted descending, and
    each batch is padded only to its own bucket (max size rounded up to
    ``pad_to_multiple``, or the ``bucket_sizes`` ladder) — the eval protocol
    stops paying max_n^2 edge work for mostly-small molecules while XLA
    caches one executable per bucket.  Pass ``pad_to`` to pin a single
    compile shape instead (exact reference padding behavior,
    qm9_mol_gen_ddpm.py:778-829 pads everything to dataset max).

    Per-molecule device cost is batch-size-insensitive for batches in
    [125, 500] and scales ~N^2.2 (measured, TPU v5e, BASELINE.md), so
    smaller batches + finer buckets trade compile count for throughput:
    ``pad_to_multiple=2`` (default) balances the two; ``=1`` with
    ``batch_size=125`` is ~8% faster again on the QM9 size distribution
    but compiles one executable per distinct even/odd size."""
    from bio_diffusion_tpu.data.batch import select_bucket

    sizes_all = nodes_dist.sample(num_samples, rng)
    if pad_to is None and sort_sizes:
        sizes_all = np.sort(sizes_all)[::-1]

    xs, masks, sizes = [], [], []
    for start in range(0, num_samples, batch_size):
        num_nodes = sizes_all[start: start + batch_size]
        b = len(num_nodes)
        if pad_to is not None:
            n_pad = pad_to
        else:
            n_pad = select_bucket(int(num_nodes.max()), bucket_sizes, pad_to_multiple)
            # never exceed the dataset maximum through round-up alone
            n_pad = min(n_pad, max(int(nodes_dist.max_n), int(num_nodes.max())))
        node_mask = jnp.asarray(make_node_mask(num_nodes, n_pad))
        context = None
        if props_distr is not None:
            ctx = props_distr.sample_batch(num_nodes, rng)  # [b, C]
            context = jnp.asarray(
                np.broadcast_to(ctx[:, None, :], (b, n_pad, ctx.shape[-1])).copy()
                * np.asarray(node_mask)[..., None]
            )
        elif context_fn is not None:
            context = context_fn(num_nodes, node_mask)
        key, k = jax.random.split(key)
        xh = sampler.run(k, node_mask, num_timesteps=num_timesteps, context=context)
        xs.append(xh)
        masks.append(np.asarray(node_mask))
        sizes.append(num_nodes)

    n_max = max(x.shape[1] for x in xs)

    def pad_n(a):
        return np.pad(a, [(0, 0), (0, n_max - a.shape[1])] + [(0, 0)] * (a.ndim - 2))

    return (
        np.concatenate([pad_n(x) for x in xs]),
        np.concatenate([pad_n(m) for m in masks]),
        np.concatenate(sizes),
    )


def analyze_samples(
    xh: np.ndarray,
    node_mask: np.ndarray,
    dataset_info: Dict[str, Any],
    include_charges: bool = True,
    molecular_metrics=None,
) -> Dict[str, float]:
    """Stability/KL metrics over sampled molecules (reference analyze_samples,
    qm9_mol_gen_ddpm.py:845-885); validity/uniqueness/novelty when an RDKit
    metrics object is supplied."""
    dataset_info = ensure_bond_tables(dataset_info)
    k = len(dataset_info["atom_decoder"])
    x = xh[..., :3]
    one_hot = xh[..., 3: 3 + k]
    atom_types = one_hot.argmax(-1)

    mol_stable, stable_atoms, num_atoms = batch_molecular_stability(
        x, atom_types, node_mask, dataset_info
    )
    metrics = {
        "mol_stable": float(mol_stable.mean()),
        "atm_stable": float(stable_atoms.sum() / max(num_atoms.sum(), 1)),
    }

    type_dist = CategoricalDistribution(dataset_info["atom_types"], dataset_info["atom_encoder"])
    flat_types = atom_types[node_mask > 0].astype(int).tolist()
    metrics["kl_div_atom_types"] = type_dist.kl_divergence(flat_types)

    if molecular_metrics is not None:
        mols = [
            (x[i][node_mask[i] > 0], atom_types[i][node_mask[i] > 0])
            for i in range(len(x))
        ]
        validity, uniqueness, novelty = molecular_metrics.evaluate(mols)[:3]
        metrics.update(validity=validity, uniqueness=uniqueness, novelty=novelty)
    return metrics


def ligand_pocket_geometry(
    ligand_x: np.ndarray,  # [B, Nl, 3]
    ligand_mask: np.ndarray,  # [B, Nl]
    pocket_x: np.ndarray,  # [B, Np, 3]
    pocket_mask: np.ndarray,  # [B, Np]
) -> Dict[str, float]:
    """Geometry diagnostics for pocket-conditional generation (host-side).

    Valence-based stability is a NULL metric on the synthetic random-walk
    joint data (its own ground-truth ligands score ~0: interior chain atoms
    have valence 2) — these two geometric statistics discriminate trained
    from untrained models on any joint distribution:

      lig_nn_dist    mean nearest-neighbor distance among each ligand's
                     atoms (Å) — bonded-scale spacing (data ~1.1 Å on the
                     synthetic chains) vs the reverse-chain blow-up an
                     untrained denoiser produces
      lig_center_rms mean RMS ligand-atom distance from the POCKET centroid
                     (Å) — is the ligand actually placed inside the pocket
                     (data ~2.3 Å inside a ~10 Å shell)

    Returns {} when no molecule has >= 2 ligand atoms.
    """
    nn_dists, center_rms = [], []
    for i in range(len(ligand_x)):
        lm = ligand_mask[i] > 0
        pm = pocket_mask[i] > 0
        x = np.asarray(ligand_x[i][lm], dtype=np.float64)
        if len(x) < 2 or pm.sum() == 0:
            continue
        dm = np.linalg.norm(x[:, None] - x[None], axis=-1)
        np.fill_diagonal(dm, np.inf)
        nn_dists.append(dm.min(axis=1).mean())
        center = np.asarray(pocket_x[i][pm], dtype=np.float64).mean(axis=0)
        center_rms.append(np.sqrt(((x - center) ** 2).sum(-1).mean()))
    if not nn_dists:
        return {}
    return {
        "lig_nn_dist": float(np.mean(nn_dists)),
        "lig_center_rms": float(np.mean(center_rms)),
    }


def generate_ligands_in_pocket(
    evd,
    params,
    key,
    pocket_x: np.ndarray,
    pocket_types: np.ndarray,
    pocket_mask: np.ndarray,
    ligand_sizes: np.ndarray,
    num_ligand_atom_types: int,
    num_resamplings: int = 1,
    jump_length: int = 1,
    num_timesteps: Optional[int] = None,
    mesh=None,
    pad_to_multiple: int = 1,
) -> Dict[str, np.ndarray]:
    """Pocket-conditional ligand generation: RePaint inpainting over the
    joint ligand+pocket graph with the pocket rows fixed.

    This is the generation path the reference delegates to GCDM-SBDD
    (README.md:302-304) while shipping the dataset metadata itself
    (constants.py:98-1742): the diffusion model is trained unconditionally
    on joint graphs, and conditioning happens at sampling time by fixing
    the pocket through ``EVD.inpaint``'s ``node_mask_fixed`` — exactly the
    RePaint recipe the inpaint machinery implements
    (variational_diffusion.py:1582-1789).

    Inputs:
      pocket_x     [B, Np, 3]  pocket CA coordinates (any frame)
      pocket_types [B, Np]     residue type indices into the aa space
      pocket_mask  [B, Np]     0/1 pocket-row validity
      ligand_sizes [B]         atoms to generate per pocket
      num_ligand_atom_types    Kl — the ligand block width of the joint
                               one-hot ([ligand | residue] layout,
                               data/pocket.py JointLigandPocketBatch)

    Output dict (all host numpy, ligand coordinates expressed in the INPUT
    pocket frame; pocket rows of ``joint_xh`` are restored bit-exact to the
    inputs — the pocket is conditioning, not a sample):
      ligand_x [B, Nl, 3], ligand_one_hot [B, Nl, Kl], ligand_mask [B, Nl],
      joint_xh [B, Nl+Np, 3+K], node_mask, fixed_mask
    """
    from bio_diffusion_tpu.config.schema import compute_num_atom_types
    from bio_diffusion_tpu.data.batch import round_up
    from bio_diffusion_tpu.data.pocket import JointLigandPocketBatch

    ligand_sizes = np.asarray(ligand_sizes, dtype=np.int64)
    pocket_x = np.asarray(pocket_x, dtype=np.float32)
    pocket_mask = np.asarray(pocket_mask, dtype=np.float32)
    b, np_pad = pocket_mask.shape
    nl_pad = round_up(int(ligand_sizes.max()), pad_to_multiple)

    k_total = compute_num_atom_types(evd.dataloader_cfg)
    kl = int(num_ligand_atom_types)
    kp = k_total - kl
    if kp <= 0:
        raise ValueError(
            f"model atom-type width {k_total} does not leave room for a "
            f"pocket block after {kl} ligand types"
        )
    pocket_one_hot = (
        np.eye(kp, dtype=np.float32)[np.asarray(pocket_types, dtype=np.int64)]
        * pocket_mask[..., None]
    )
    pocket_x = pocket_x * pocket_mask[..., None]

    ligand_mask = np.asarray(make_node_mask(ligand_sizes, nl_pad), dtype=np.float32)
    joint = JointLigandPocketBatch(
        ligand_x=np.zeros((b, nl_pad, 3), np.float32),
        ligand_one_hot=np.zeros((b, nl_pad, kl), np.float32),
        ligand_mask=ligand_mask,
        pocket_x=pocket_x,
        pocket_one_hot=pocket_one_hot,
        pocket_mask=pocket_mask,
    )

    x0 = jnp.asarray(joint.x)
    h0_cat = jnp.asarray(joint.one_hot)
    h0_int = jnp.zeros((b, nl_pad + np_pad, int(evd.dataloader_cfg.include_charges)))
    node_mask = jnp.asarray(joint.node_mask)
    fixed_mask = jnp.asarray(joint.fixed_mask)

    fast = build_fast_evd(evd, params, mesh=mesh)
    run_evd, run_params = (fast, {}) if fast is not None else (evd, params)

    @jax.jit
    def run_inpaint(p, k):
        return run_evd.apply(
            p, k, x0, h0_cat, h0_int, node_mask, fixed_mask,
            num_resamplings, jump_length, num_timesteps,
            method=run_evd.inpaint,
        )

    xh = np.array(run_inpaint(run_params, key))  # writable host copy

    # restore the input pocket frame: inpaint's output is re-centered on the
    # joint CoM, so align by the best-fit translation of the decoded pocket
    # onto the input pocket, then restore pocket rows bit-exact (the pocket
    # is conditioning — only the translation it pins down is kept)
    dec_pocket = xh[:, nl_pad:, :3]
    count = np.maximum(pocket_mask.sum(axis=1, keepdims=True), 1.0)
    shift = ((pocket_x - dec_pocket) * pocket_mask[..., None]).sum(axis=1) / count  # [B,3]
    xh[..., :3] += shift[:, None, :]
    xh[..., :3] *= np.asarray(joint.node_mask)[..., None]
    xh[:, nl_pad:, :3] = pocket_x
    xh[:, nl_pad:, 3: 3 + k_total] = joint.one_hot[:, nl_pad:]

    # ligand atom types are constrained to the ligand block: re-argmax the
    # decoded logits-as-one-hot over [0, Kl) (a generated ligand row whose
    # joint argmax fell in the residue block decodes to its best ligand type)
    lig_block = xh[:, :nl_pad, 3: 3 + kl]
    lig_types = lig_block.argmax(-1)
    ligand_one_hot = np.eye(kl, dtype=np.float32)[lig_types] * ligand_mask[..., None]
    xh[:, :nl_pad, 3: 3 + k_total] = 0.0
    xh[:, :nl_pad, 3: 3 + kl] = ligand_one_hot

    return {
        "ligand_x": xh[:, :nl_pad, :3] * ligand_mask[..., None],
        "ligand_one_hot": ligand_one_hot,
        "ligand_mask": ligand_mask,
        "joint_xh": xh,
        "node_mask": np.asarray(joint.node_mask),
        "fixed_mask": np.asarray(joint.fixed_mask),
    }
