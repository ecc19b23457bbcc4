"""The full reference config surface loads unmodified.

(reference: conf/ — five trees × six defaults groups; README.md:27-31 CLI;
SURVEY §2.12.)  Every yaml the reference ships must exist here with the same
relative path, every root config must compose, and the TranSeg experiment
config must build a transformer trainer.
"""

from __future__ import annotations

import os

import pytest
import yaml

from bacs_tpu.config.core import load_config

REPO_CONF = os.path.join(os.path.dirname(__file__), "..", "conf")
REF_CONF = "/root/reference/conf"


def _yaml_paths(root):
    out = set()
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".yaml"):
                out.add(os.path.relpath(os.path.join(dirpath, f), root))
    return out


def _root_configs():
    """(tree_path, config_name) for every repo yaml with a `defaults:` list."""
    roots = []
    for tree in sorted(os.listdir(REPO_CONF)):
        tree_path = os.path.join(REPO_CONF, tree)
        if not os.path.isdir(tree_path):
            continue
        for f in sorted(os.listdir(tree_path)):
            if not f.endswith(".yaml"):
                continue
            with open(os.path.join(tree_path, f)) as fh:
                doc = yaml.safe_load(fh) or {}
            if "defaults" in doc:
                roots.append((tree_path, f[: -len(".yaml")]))
    return roots


@pytest.mark.skipif(not os.path.isdir(REF_CONF), reason="reference unavailable")
def test_reference_conf_tree_fully_mirrored():
    missing = _yaml_paths(REF_CONF) - _yaml_paths(REPO_CONF)
    assert not missing, f"reference configs missing from conf/: {sorted(missing)}"


@pytest.mark.parametrize("tree,name", _root_configs())
def test_root_config_composes(tree, name):
    cfg = load_config(tree, name)
    for group in ("dataset", "network", "optimizer", "scheduler", "training", "loss"):
        assert group in cfg, f"{tree}/{name} missing group {group}"
    assert "_target_" in cfg["network"]
    assert "_target_" in cfg["loss"]


def test_bacs_transformer_config_builds_transeg_trainer():
    """`--config-path conf/experiments --config-name bacs_transformer_config`
    must build a TranSeg network + TransformerLearner trainer
    (reference: conf/experiments/bacs_transformer_config.yaml)."""
    from bacs_tpu.data import create_datamodule
    from bacs_tpu.models.transeg import TranSeg
    from bacs_tpu.train.loop import Trainer

    cfg = load_config("conf/experiments", "bacs_transformer_config")
    assert cfg["network"]["_target_"].lower().endswith("transeg") or (
        "transformer" in cfg["network"]["_target_"].lower()
    )
    assert cfg["training"]["learner"]["_target_"] == "learner.TransformerLearner"
    assert cfg["training"]["new_token_init"] == "mean"

    # VOC data is not on disk — drive the same config against the synthetic
    # datamodule (dataset group swap, everything else untouched)
    syn = load_config("conf/continual_debug", "config")
    cfg_d = dict(cfg)
    cfg_d["dataset"] = syn["dataset"]
    cfg_d["training"] = dict(cfg["training"])
    cfg_d["training"]["initial_increment"] = 3
    cfg_d["training"]["increment"] = 1
    cfg_d["training"]["mixed_precision"] = False
    cfg_d["training"]["ckpt_dir"] = None
    dm = create_datamodule(cfg_d)
    trainer = Trainer(cfg_d, datamodule=dm)
    model = trainer._make_model(trainer._task_info(0))
    assert isinstance(model, TranSeg)
    assert trainer.learner_init.__name__ == "transformer_init"
    assert trainer.new_token_init == "mean"
