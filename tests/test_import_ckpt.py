"""Reference-checkpoint migration (scripts/import_reference_ckpt.py).

Builds the reference's REAL UNet (via the parity shim), saves it exactly the
way PyTorch-Lightning does (`{"state_dict": {"network.<k>": v}}`, reference:
training/trainer.py:404), imports it into a bacs_tpu checkpoint dir, and
proves (a) forward parity of the restored state, (b) the Trainer resumes the
continual run at task t+1 and finishes it.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from bacs_tpu.config import load_config
from tests.reference_shim import load_reference_networks

pytestmark = pytest.mark.parity  # torch-reference tier (see pytest.ini)


def _reference_unet_after_task1(networks):
    """The reference MultiHeadLearner state after completing task 1 of the
    conf/continual_debug protocol (6 classes, initial_increment 3 → head 0 is
    4 classes incl. bg, head 1 adds 1; reference:
    learner/multiheadlearner.py:44-58)."""
    torch.manual_seed(3)
    ref = networks.UNet(
        n_channels=3, bilinear=True, num_layers=4, pretrained_backbone=False
    )
    ref.classifier_head = torch.nn.ModuleList(
        [ref.get_classification_head(4), ref.get_classification_head(1)]
    )
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)
    ref.eval()
    return ref


def test_import_reference_ckpt_resumes_and_matches(tmp_path):
    networks = load_reference_networks()
    ref = _reference_unet_after_task1(networks)

    # save exactly as Lightning does: state_dict keys prefixed by the module
    # attribute name (`self.network`, reference: training/model.py:34)
    ckpt_path = tmp_path / "final.ckpt"
    torch.save(
        {"state_dict": {f"network.{k}": v for k, v in ref.state_dict().items()}},
        ckpt_path,
    )

    out_dir = tmp_path / "imported"
    overrides = [
        "training.debug=false",  # debug mode disables resume (reference parity)
        f"+training.ckpt_dir={out_dir}",
    ]
    config = load_config("conf/continual_debug", "config", overrides)

    from scripts.import_reference_ckpt import import_reference_checkpoint

    state, task_id, loaded, total, path = import_reference_checkpoint(
        str(ckpt_path), config, str(out_dir)
    )
    assert task_id == 1, "task id must be inferred from the per-task head count"
    assert loaded == total, f"only {loaded}/{total} tensors converted"
    assert path.endswith("step_1/final")

    # (a) forward parity: restored Trainer state reproduces the torch model
    from bacs_tpu.train.loop import Trainer

    trainer = Trainer(config)
    start_task = trainer._try_resume()
    assert start_task == 2, "a final checkpoint of task 1 resumes at task 2"

    x = np.random.RandomState(7).rand(2, 64, 64, 3).astype(np.float32)
    task = trainer._task_info(1)
    model = trainer._make_model(task)
    out = model.apply(
        {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        },
        jnp.asarray(x),
        train=False,
    )
    # the reference multi-head forward concats per-task head outputs
    # (base_network.py:108-113)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        logits_t = ref(xt)
    np.testing.assert_allclose(
        np.asarray(out.logits[..., :5], np.float32),
        np.transpose(logits_t.numpy(), (0, 2, 3, 1)),
        atol=2e-4,
        rtol=0,
    )

    # (b) the continual run finishes from the imported checkpoint: one
    # remaining task (n_tasks=3), fresh head surgery on top of the import
    miou = trainer.fit()
    assert 0.0 <= miou <= 1.0
    assert trainer.per_step_metric.task_id == 3  # trained exactly task 2
    # head surgery happened on top of the imported params: class 6 row no
    # longer matches the untrained init of the imported state
    assert trainer.state.params is not state.params


def test_import_cli_smoke(tmp_path, capsys):
    """The CLI wrapper end-to-end (argument plumbing + summary output)."""
    networks = load_reference_networks()
    ref = _reference_unet_after_task1(networks)
    ckpt_path = tmp_path / "final.ckpt"
    torch.save(
        {"state_dict": {f"network.{k}": v for k, v in ref.state_dict().items()}},
        ckpt_path,
    )
    out_dir = tmp_path / "cli_imported"

    from scripts.import_reference_ckpt import main

    main([
        "--ckpt", str(ckpt_path),
        "--config-path", "conf/continual_debug",
        "--config-name", "config",
        "--out", str(out_dir),
        "training.debug=false",
    ])
    captured = capsys.readouterr().out
    assert "as completed task 1" in captured
    assert (out_dir / "step_1" / "final").is_dir()


def test_import_populate_buffer_on_mesh(tmp_path):
    """--populate-buffer's end_task runs plain single-device jits: it must
    use an axis-FREE model (a mesh-bound sync-BN pmean would hit an unbound
    named axis, the same latent crash loop.py's boundary_ctx fixes) and a
    loader-sized stream."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    networks = load_reference_networks()
    ref = _reference_unet_after_task1(networks)
    ckpt_path = tmp_path / "final.ckpt"
    torch.save(
        {"state_dict": {f"network.{k}": v for k, v in ref.state_dict().items()}},
        ckpt_path,
    )
    out_dir = tmp_path / "imported_mesh"
    config = load_config(
        "conf/continual_debug", "config",
        [
            "training.debug=false",
            f"+training.ckpt_dir={out_dir}",
            "+training.n_devices=2",
            "dataset.dataset.crop_size=32",
            "loss=bacs",
            "loss.buffer_size=8",
            "loss.replay_minibatch_size=2",
        ],
    )
    from scripts.import_reference_ckpt import import_reference_checkpoint

    state, task_id, loaded, total, _ = import_reference_checkpoint(
        str(ckpt_path), config, str(out_dir), populate_buffer=True
    )
    assert task_id == 1 and loaded == total
    assert state.prev_params is not None
    assert int(state.buffer.num_seen) > 0
