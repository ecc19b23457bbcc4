"""Import the read-only reference (/root/reference) for parity testing.

The reference depends on packages not installed here (inplace_abn,
pytorch_lightning, segmentation_models_pytorch).  This module installs
minimal stand-ins so the reference's REAL network/loss code can be imported
and used as ground truth.  The ABN stand-in reproduces the inplace_abn
package's documented semantics (batch-norm + fused activation); everything
else is an inert stub.

Nothing here is imported by the framework itself — test fixture only.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_inplace_abn_shim() -> None:
    if "inplace_abn" in sys.modules:
        return
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    class ABN(tnn.Module):
        """BatchNorm2d + activation, matching inplace_abn.ABN semantics."""

        def __init__(
            self,
            num_features,
            eps=1e-5,
            momentum=0.1,
            affine=True,
            activation="leaky_relu",
            activation_param=0.01,
        ):
            super().__init__()
            self.num_features = num_features
            self.eps = eps
            self.momentum = momentum
            self.affine = affine
            self.activation = activation
            self.activation_param = activation_param
            if affine:
                self.weight = tnn.Parameter(torch.ones(num_features))
                self.bias = tnn.Parameter(torch.zeros(num_features))
            else:
                self.register_parameter("weight", None)
                self.register_parameter("bias", None)
            self.register_buffer("running_mean", torch.zeros(num_features))
            self.register_buffer("running_var", torch.ones(num_features))

        def forward(self, x):
            x = tF.batch_norm(
                x,
                self.running_mean,
                self.running_var,
                self.weight,
                self.bias,
                self.training,
                self.momentum,
                self.eps,
            )
            if self.activation == "leaky_relu":
                return tF.leaky_relu(x, self.activation_param)
            if self.activation == "relu":
                return tF.relu(x)
            if self.activation == "elu":
                return tF.elu(x, self.activation_param)
            return x

    class InPlaceABN(ABN):
        pass

    class InPlaceABNSync(ABN):
        pass

    mod = types.ModuleType("inplace_abn")
    mod.ABN = ABN
    mod.InPlaceABN = InPlaceABN
    mod.InPlaceABNSync = InPlaceABNSync
    functions = types.ModuleType("inplace_abn.functions")

    def _unavailable(*_a, **_k):  # the ABR in-place kernels; unused in tests
        raise NotImplementedError("inplace_abn CUDA kernels not available")

    functions.inplace_abn = _unavailable
    functions.inplace_abn_sync = _unavailable
    mod.functions = functions
    sys.modules["inplace_abn"] = mod
    sys.modules["inplace_abn.functions"] = functions


def _install_pl_shim() -> None:
    if "pytorch_lightning" in sys.modules:
        return
    pl = types.ModuleType("pytorch_lightning")
    utilities = types.ModuleType("pytorch_lightning.utilities")
    utilities.rank_zero_warn = lambda *a, **k: None
    pl.utilities = utilities
    sys.modules["pytorch_lightning"] = pl
    sys.modules["pytorch_lightning.utilities"] = utilities


def load_reference_networks():
    """Import and return the reference `networks` package."""
    _install_inplace_abn_shim()
    _install_pl_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import networks  # noqa: the reference package

    return networks


def _install_aux_shims() -> None:
    """Stubs needed to import the reference `loss` package itself
    (loss/__init__.py pulls in every method class)."""
    import os

    import torch
    import torch.nn.functional as tF

    pl = sys.modules["pytorch_lightning"]
    if "pytorch_lightning.utilities.memory" not in sys.modules:
        mem = types.ModuleType("pytorch_lightning.utilities.memory")
        mem.garbage_collection_cuda = lambda *a, **k: None
        pl.utilities.memory = mem
        sys.modules["pytorch_lightning.utilities.memory"] = mem
    if "pytorch_lightning.trainer.supporters" not in sys.modules:
        sup = types.ModuleType("pytorch_lightning.trainer.supporters")

        class CombinedLoader:  # inert: loss parity tests never iterate it
            def __init__(self, loaders, mode="max_size_cycle"):
                self.loaders = loaders

            def __iter__(self):
                raise NotImplementedError

        sup.CombinedLoader = CombinedLoader
        trainer_mod = types.ModuleType("pytorch_lightning.trainer")
        trainer_mod.supporters = sup
        pl.trainer = trainer_mod
        sys.modules["pytorch_lightning.trainer"] = trainer_mod
        sys.modules["pytorch_lightning.trainer.supporters"] = sup

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvd = types.ModuleType("torchvision.datasets")
        tvdu = types.ModuleType("torchvision.datasets.utils")

        def download_url(*a, **k):  # no egress in this environment
            raise RuntimeError("download_url unavailable in tests")

        tvdu.download_url = download_url
        tvd.utils = tvdu
        tvt = types.ModuleType("torchvision.transforms")

        class RandomAutocontrast:
            """torchvision semantics: per-channel min/max stretch, applied
            with probability p per call (reference BACS replay re-aug)."""

            def __init__(self, p=0.5):
                self.p = p

            def __call__(self, img):
                if torch.rand(()) >= self.p:
                    return img
                flat = img.flatten(-2)
                lo = flat.min(dim=-1).values[..., None, None]
                hi = flat.max(dim=-1).values[..., None, None]
                scale = torch.where(hi > lo, 1.0 / (hi - lo), torch.ones_like(hi))
                return torch.where(hi > lo, (img - lo) * scale, img)

        tvt.RandomAutocontrast = RandomAutocontrast
        tv.datasets = tvd
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.datasets"] = tvd
        sys.modules["torchvision.datasets.utils"] = tvdu
        sys.modules["torchvision.transforms"] = tvt

    if "segmentation_models_pytorch" not in sys.modules:
        smp = types.ModuleType("segmentation_models_pytorch")
        smp_losses = types.ModuleType("segmentation_models_pytorch.losses")

        class FocalLoss:
            """smp.losses.FocalLoss, binary mode — faithful reimplementation
            of focal_loss_with_logits (smp losses/_functional.py)."""

            def __init__(self, mode="binary", alpha=None, gamma=2.0,
                         ignore_index=None, reduction="mean",
                         normalized=False, reduced_threshold=None):
                assert mode == "binary"
                self.alpha, self.gamma = alpha, gamma
                self.ignore_index = ignore_index
                self.reduction = reduction

            def __call__(self, y_pred, y_true):
                y_pred = y_pred.reshape(-1)
                y_true = y_true.reshape(-1)
                if self.ignore_index is not None:
                    keep = y_true != self.ignore_index
                    y_pred, y_true = y_pred[keep], y_true[keep]
                y_true = y_true.float()
                logpt = -tF.binary_cross_entropy_with_logits(
                    y_pred, y_true, reduction="none"
                )
                pt = torch.exp(logpt)
                loss = -((1.0 - pt) ** self.gamma) * logpt
                if self.alpha is not None:
                    loss = loss * (
                        self.alpha * y_true + (1 - self.alpha) * (1 - y_true)
                    )
                if self.reduction == "mean":
                    return loss.mean()
                if self.reduction == "sum":
                    return loss.sum()
                return loss

        smp_losses.FocalLoss = FocalLoss
        smp.losses = smp_losses
        sys.modules["segmentation_models_pytorch"] = smp
        sys.modules["segmentation_models_pytorch.losses"] = smp_losses

    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hutils = types.ModuleType("hydra.utils")
        hutils.get_original_cwd = lambda: os.getcwd()
        hydra.utils = hutils
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hutils

    if "training" not in sys.modules:
        # package with __path__ but no executed __init__: lets
        # `training.loss_utils` / `training.utils` / `training.buffer`
        # import without the real training/__init__.py (which needs the
        # full pytorch_lightning Trainer)
        tr = types.ModuleType("training")
        tr.__path__ = [REFERENCE_ROOT + "/training"]
        sys.modules["training"] = tr


def load_reference_loss():
    """Import and return the reference `loss` package (all method classes)."""
    _install_inplace_abn_shim()
    _install_pl_shim()
    _install_aux_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import loss  # noqa: the reference package

    return loss


def load_reference_learner():
    """Import the reference `learner` package (head-surgery callbacks).

    Only its PL/visualization *plumbing* is stubbed (Callback base class,
    the Mode enum); the surgery logic itself — MultiHeadLearner
    ._initialize_head etc. — is the reference's real code."""
    load_reference_networks()
    _install_aux_shims()
    pl = sys.modules["pytorch_lightning"]
    if "pytorch_lightning.callbacks" not in sys.modules:
        cb = types.ModuleType("pytorch_lightning.callbacks")

        class Callback:  # inert base: learners are driven directly in tests
            pass

        cb.Callback = Callback
        pl.callbacks = cb
        sys.modules["pytorch_lightning.callbacks"] = cb
    if "visualization" not in sys.modules:
        # shadow the reference's visualization package (pulls wandb/cv2)
        import enum

        viz = types.ModuleType("visualization")

        class Mode(enum.Enum):
            TRAIN = "train"
            VAL = "val"
            TEST = "test"

        viz.Mode = Mode
        sys.modules["visualization"] = viz
    import learner  # noqa: the reference package

    return learner


def load_reference_buffer():
    """Import the reference's real replay buffer (training/buffer.py —
    plain torch+numpy, runnable here) for boundary-parity tests."""
    _install_inplace_abn_shim()
    _install_pl_shim()
    _install_aux_shims()
    import numpy as np

    if not hasattr(np, "Inf"):  # NumPy 2.x removed the alias the reference uses
        np.Inf = np.inf
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import training.buffer as refbuf  # noqa: the reference module

    return refbuf


def load_reference_loss_utils():
    """Load reference training/loss_utils.py standalone (skips the heavy
    training/__init__.py which imports pytorch_lightning's Trainer)."""
    name = "_reference_loss_utils"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, REFERENCE_ROOT + "/training/loss_utils.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
