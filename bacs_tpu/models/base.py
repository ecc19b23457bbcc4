"""Forward contract shared by all networks.

The reference's bool-flag forward returns
(`forward(x, return_attentions, return_penultimate, return_sem_logits)`,
reference: networks/base_network.py:128-146) become a single NamedTuple: the
network always computes every field, and XLA's dead-code elimination removes
whatever a particular loss does not consume — so there is exactly one traced
forward, not four variants.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax

Array = jax.Array


class NetOutput(NamedTuple):
    """Everything a CL loss plugin may need from one forward pass.

    logits:      [N, H, W, C] upsampled to input resolution
    sem_logits:  [N, h, w, C] pre-upsample classifier output
                 (reference: base_network.py:52-65 cached sem logits)
    penultimate: [N, h, w, D] backbone features (fed to prototypes/BgDetector;
                 reference: deeplab_v3.py:112-124)
    attentions:  per-stage pre-activation maps + head output, for POD
                 (reference: deeplab_v3.py:146-152)
    """

    logits: Array
    sem_logits: Array
    penultimate: Array
    attentions: Tuple[Array, ...]
