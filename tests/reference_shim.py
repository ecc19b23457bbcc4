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
