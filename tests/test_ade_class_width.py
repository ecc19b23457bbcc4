"""ADE20K-width (151-class) two-task BACS composition (VERDICT r3 next #8).

The padded-class-width machinery — buffer logits allocated at the FINAL
151-channel width, prototypes, detector heads, the 100→150 head growth —
was previously only exercised at VOC's 21 classes.  This runs the full
BACS composition through a tiny 100-50 split (BASELINE.json config #5's
shape; reference: conf/experiments/dataset/ade.yaml) and checks the
class-width plumbing end to end.
"""

from __future__ import annotations

import numpy as np

from bacs_tpu.config import load_config
from bacs_tpu.train.loop import Trainer


def test_bacs_100_50_at_ade_class_width():
    config = load_config(
        "conf/continual_debug", "config",
        [
            "loss=bacs",
            "training.bg_detector=true",
            "loss.buffer_size=4",
            "loss.replay_minibatch_size=2",
            "dataset.dataset.num_classes=151",
            "dataset.dataset.crop_size=16",
            "dataset.dataset.n_train=12",
            "dataset.dataset.n_val=4",
            "+dataset.dataset.style=rich",
            "training.initial_increment=100",
            "training.increment=50",
            "training.batch_size=2",
            "training.epochs=1",
            "training.debug=false",
            "network.num_layers=3",
        ],
    )
    trainer = Trainer(config)
    assert trainer.n_tasks == 2
    assert trainer.datamodule.n_classes_at(0) == 101
    assert trainer.datamodule.n_classes_at(1) == 151
    miou = trainer.fit()
    assert np.isfinite(miou)
    # buffer logits were allocated at the FINAL 151-channel width up front
    # (no change_data_size surgery — SURVEY §7.7)
    assert trainer.state.buffer is not None
    assert trainer.state.buffer.logits.shape[-1] == 151
    assert int(trainer.state.buffer.valid.sum()) > 0
    # prototypes and detector heads span both tasks
    assert trainer.state.prototypes.shape[0] == 2
    # the final head covers all 151 classes (padded single conv)
    logits_w = trainer.state.params["classifier_head"]["kernel"].shape[-1]
    assert logits_w == 151
