"""Import shims that let the PUBLIC reference implementation run on CPU torch.

The reference (/root/reference, GCDM/bio-diffusion) hard-imports a number of
packages that are not in this environment (torch_scatter, torch_geometric,
omegaconf, pytorch_lightning, wandb, rdkit, ...).  Only a handful of them are
actually *exercised* by the code paths we need for numerical parity testing
(the GCPNetDynamics forward and the EVD's deterministic helpers); the rest are
import-time-only (decorators, loggers, viz).

``install()`` registers minimal stand-ins in sys.modules and puts
/root/reference on sys.path so ``import src.models.components.gcpnet`` works.
Functional shims (faithful implementations, used in the compute path):

  * torch_scatter.scatter  — index_add-based sum/mean/add reduction
  * torch_geometric.data.Batch/Data — attribute-bag graph containers
  * omegaconf.OmegaConf.to_container / DictConfig — dict with attr access

Everything else is inert (identity decorators, empty classes).

This file intentionally contains NO reference code; it only reimplements the
public APIs of third-party libraries the reference depends on.
"""

from __future__ import annotations

import sys
import types
from contextlib import contextmanager

REFERENCE_ROOT = "/root/reference"


def _mod(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


# ---------------------------------------------------------------------------
# functional shims
# ---------------------------------------------------------------------------

def _make_torch_scatter():
    import torch

    def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
        """torch_scatter.scatter for reduce in {sum, add, mean} (public API)."""
        if dim < 0:
            dim = src.dim() + dim
        if dim_size is None:
            dim_size = int(index.max().item()) + 1 if index.numel() else 0
        shape = list(src.shape)
        shape[dim] = dim_size
        base = torch.zeros(shape, dtype=src.dtype, device=src.device)
        # broadcast index to src's shape along `dim`
        idx = index
        if idx.dim() == 1 and src.dim() > 1:
            view = [1] * src.dim()
            view[dim] = -1
            idx = idx.view(view).expand_as(src)
        summed = base.scatter_add(dim, idx, src)
        if reduce in ("sum", "add"):
            result = summed
        elif reduce == "mean":
            ones = torch.ones_like(src, dtype=src.dtype)
            counts = torch.zeros(shape, dtype=src.dtype, device=src.device)
            counts = counts.scatter_add(dim, idx, ones)
            result = summed / counts.clamp(min=1)
        else:
            raise NotImplementedError(f"scatter reduce={reduce!r}")
        if out is not None:
            out.copy_(result)
            return out
        return result

    m = _mod("torch_scatter")
    m.scatter = scatter
    m.scatter_add = lambda src, index, **kw: scatter(src, index, reduce="sum", **kw)
    m.scatter_mean = lambda src, index, **kw: scatter(src, index, reduce="mean", **kw)
    return m


class _GraphBag:
    """torch_geometric.data.Batch/Data stand-in: an attribute bag.

    Supports kwargs construction, attribute get/set/del, ``batch["x"]``
    item access, and an explicit ``num_nodes`` attribute.
    """

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __getitem__(self, key):
        return getattr(self, key)

    def __setitem__(self, key, value):
        setattr(self, key, value)

    def __contains__(self, key):
        return hasattr(self, key)

    def __getattr__(self, name):
        # PyG Batch derives num_nodes from its node store; mirror that for
        # bags constructed with only a `batch` index vector
        if name == "num_nodes":
            b = self.__dict__.get("batch")
            if b is not None:
                return b.shape[0]
        raise AttributeError(name)


def _make_torch_geometric():
    tg = _mod("torch_geometric")
    data = _mod("torch_geometric.data")
    loader = _mod("torch_geometric.loader")

    class Dataset:  # base class only (never instantiated in parity tests)
        def __init__(self, *a, **k):
            pass

    data.Batch = _GraphBag
    data.Data = _GraphBag
    data.Dataset = Dataset
    loader.DataLoader = Dataset
    tg.data = data
    tg.loader = loader
    return tg


def _make_omegaconf():
    m = _mod("omegaconf")

    class DictConfig(dict):
        """dict with attribute access (subset of omegaconf.DictConfig)."""

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

        def __setattr__(self, name, value):
            self[name] = value

    class OmegaConf:
        @staticmethod
        def to_container(cfg, throw_on_missing=False, resolve=False):
            return dict(cfg)

        @staticmethod
        def create(obj=None):
            return DictConfig(obj or {})

        @staticmethod
        def to_object(cfg):
            return dict(cfg)

    @contextmanager
    def open_dict(cfg):
        yield cfg

    m.DictConfig = DictConfig
    m.OmegaConf = OmegaConf
    m.open_dict = open_dict
    m.MISSING = "???"
    return m


# ---------------------------------------------------------------------------
# inert shims (import-time only)
# ---------------------------------------------------------------------------

def _identity_decorator(func=None, **kwargs):
    if func is None:
        return lambda f: f
    return func


def _make_torchtyping():
    import torch

    m = _mod("torchtyping")

    class _TensorTypeMeta(type):
        def __getitem__(cls, item):
            return torch.Tensor

    class TensorType(metaclass=_TensorTypeMeta):
        pass

    m.TensorType = TensorType
    m.patch_typeguard = lambda *a, **k: None
    return m


def _make_typeguard():
    m = _mod("typeguard")
    m.typechecked = _identity_decorator
    return m


def _make_pytorch_lightning():
    pl = _mod("pytorch_lightning")

    def rank_zero_only(fn):
        return fn

    rank_zero_only.rank = 0

    class Callback:
        pass

    class LightningModule:
        pass

    class ModelCheckpoint(Callback):
        def __init__(self, *a, **k):
            pass

    class Logger:
        pass

    class WandbLogger(Logger):
        pass

    utilities = _mod("pytorch_lightning.utilities")
    utilities.rank_zero_only = rank_zero_only
    utilities.rank_zero_warn = lambda *a, **k: None
    utilities.rank_zero_info = lambda *a, **k: None
    exceptions = _mod("pytorch_lightning.utilities.exceptions")
    exceptions.MisconfigurationException = type(
        "MisconfigurationException", (Exception,), {}
    )
    types_mod = _mod("pytorch_lightning.utilities.types")
    types_mod.STEP_OUTPUT = object
    utilities.exceptions = exceptions
    utilities.types = types_mod

    callbacks = _mod("pytorch_lightning.callbacks")
    callbacks.ModelCheckpoint = ModelCheckpoint
    callbacks.Callback = Callback

    loggers = _mod("pytorch_lightning.loggers")
    loggers.LightningLoggerBase = Logger
    logger_mod = _mod("pytorch_lightning.loggers.logger")
    logger_mod.Logger = Logger
    wandb_mod = _mod("pytorch_lightning.loggers.wandb")
    wandb_mod.WandbLogger = WandbLogger
    loggers.logger = logger_mod
    loggers.wandb = wandb_mod

    pl.Callback = Callback
    pl.LightningModule = LightningModule
    pl.loggers = loggers
    pl.callbacks = callbacks
    pl.utilities = utilities
    pl.seed_everything = lambda *a, **k: None
    return pl


def _make_misc():
    wandb = _mod("wandb")
    wandb.Image = object
    wandb.Histogram = object
    wandb.log = lambda *a, **k: None
    sdk = _mod("wandb.sdk")
    run_mod = _mod("wandb.sdk.wandb_run")
    run_mod.Run = type("Run", (), {})
    sdk.wandb_run = run_mod
    wandb.sdk = sdk

    prody = _mod("prody")
    prody.confProDy = lambda *a, **k: None

    rdkit = _mod("rdkit")
    chem = _mod("rdkit.Chem")
    chem.Mol = type("Mol", (), {})
    rdchem = _mod("rdkit.Chem.rdchem")
    rdchem.BondType = type(
        "BondType", (), {"SINGLE": 1, "DOUBLE": 2, "TRIPLE": 3, "AROMATIC": 12}
    )
    chem.rdchem = rdchem
    rdkit.Chem = chem

    torchviz = _mod("torchviz")
    torchviz.make_dot = lambda *a, **k: None

    tc = _mod("torch_cluster")

    def _unavailable(*a, **k):
        raise NotImplementedError("torch_cluster shim: not needed for parity tests")

    tc.knn_graph = _unavailable
    tc.radius_graph = _unavailable

    hydra = _mod("hydra")
    core = _mod("hydra.core")
    hydra_config = _mod("hydra.core.hydra_config")
    hydra_config.HydraConfig = type("HydraConfig", (), {"get": staticmethod(lambda: None)})
    core.hydra_config = hydra_config
    hydra.core = core
    hydra.main = lambda *a, **k: _identity_decorator

    # matplotlib>=3.7 removed matplotlib.axes._subplots; the reference only
    # uses it for a type annotation
    try:
        import matplotlib.axes._subplots  # noqa: F401
    except ImportError:
        import matplotlib.axes

        sub = _mod("matplotlib.axes._subplots")
        sub.Axes = matplotlib.axes.Axes


_INSTALLED = False


def install() -> None:
    """Register all shims and put the reference tree on sys.path."""
    global _INSTALLED
    if _INSTALLED:
        return
    _make_torch_scatter()
    _make_torch_geometric()
    _make_omegaconf()
    _make_torchtyping()
    _make_typeguard()
    _make_pytorch_lightning()
    _make_misc()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _INSTALLED = True


def make_batch(**kwargs) -> _GraphBag:
    return _GraphBag(**kwargs)
