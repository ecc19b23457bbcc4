"""Domain-shift scenario, visualization callbacks, and OOD aux metrics."""

import numpy as np
import jax.numpy as jnp

from bacs_tpu.data.continual import DomainScenario
from bacs_tpu.ops.confusion import confusion_matrix
from bacs_tpu.train.ood import aux_bg_summary
from bacs_tpu.train.state import TaskInfo
from bacs_tpu.viz.media import voc_colormap


def test_domain_scenario_splits():
    # 12 images across 3 domains, 1 domain per task
    domain_ids = [i % 3 for i in range(12)]
    s = DomainScenario(domain_ids, num_classes=5, n_domains_per_task=1)
    assert s.n_tasks == 3
    tr0, v0 = set(s.task_indices(0)), set(s.val_indices(0))
    # train/val disjoint, all from domain 0
    assert not (tr0 & v0)
    assert all(domain_ids[i] == 0 for i in tr0 | v0)
    # label table is identity for valid classes
    t = s.label_table(0)
    assert t[3] == 3 and t[255] == 255 and t[200] == 0


def test_domain_taskinfo_class_semantics():
    """(reference: learner/baselearner.py:60-66 domain override)"""
    task = TaskInfo(task_id=2, initial_classes=5, increment=0, num_classes=5,
                    n_tasks=3, domain_shift=True)
    assert task.nb_current_classes == 5
    assert task.old_classes == 5
    assert task.nb_new_classes == 5


def test_voc_colormap_reference_values():
    cmap = voc_colormap()
    # canonical VOC palette entries
    np.testing.assert_array_equal(cmap[0], [0, 0, 0])
    np.testing.assert_array_equal(cmap[1], [128, 0, 0])
    np.testing.assert_array_equal(cmap[2], [0, 128, 0])
    np.testing.assert_array_equal(cmap[15], [192, 128, 128])


def test_aux_bg_summary_keys():
    pred = np.array([[0, 1, 1, 0]], np.int32)
    target = np.array([[0, 1, 0, 0]], np.int32)
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(target), 2)
    out = aux_bg_summary(np.asarray(cm))
    assert set(out) == {
        "IoU-bg", "IoU-not-bg", "mIoU", "Accuracy", "Precision", "Recall"
    }
    assert 0 <= out["mIoU"] <= 1


def test_media_logger_wandb_masks():
    """wandb mask media parity (reference: log_media.py:265-290): one
    wandb.Image per sample carrying predictions + groud_truth mask layers
    with class_labels, logged under `<Split>/Task <t>/Predictions`."""
    from bacs_tpu.viz.media import MediaLogger

    class FakeWandb:
        def __init__(self):
            self.images = []
            self.logged = {}

        def Image(self, img, masks=None):
            self.images.append((np.asarray(img), masks))
            return ("img", len(self.images) - 1)

        def log(self, payload, commit=True):
            assert commit is False
            self.logged.update(payload)

    class FakeLogger:
        _wandb = FakeWandb()

    m = MediaLogger("/tmp/media_test", max_samples=4)
    img = np.zeros((2, 8, 8, 3), np.float32)
    lbl = np.ones((2, 8, 8), np.int32)
    pred = np.zeros((2, 8, 8), np.int32)
    m.append("test", img, lbl, pred)
    m.log_wandb(FakeLogger, task_id=3, class_names=["background", "cat"])
    w = FakeLogger._wandb
    assert "Test/Task 3/Predictions" in w.logged
    assert len(w.logged["Test/Task 3/Predictions"]) == 2
    _, masks = w.images[0]
    assert set(masks) == {"predictions", "groud_truth"}
    np.testing.assert_array_equal(masks["groud_truth"]["mask_data"],
                                  np.ones((8, 8), np.uint8))
    assert masks["predictions"]["class_labels"] == {0: "background", 1: "cat"}
    # no wandb configured → silent no-op
    m.log_wandb(object(), task_id=0)


def test_aux_bg_step_jitted_path():
    """Full aux-bg eval pass through a bg-detector UNet."""
    import jax
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.models import create_network
    from bacs_tpu.train.ood import aux_bg_step, ood_test
    from bacs_tpu.train.state import TrainState

    net = create_network("unet", num_classes=4, n_tasks=2, use_bg_detector=True,
                         axis_name=None, crop_size=16, num_layers=3)
    x = jnp.zeros((2, 16, 16, 3))
    v = net.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, x, train=True)
    task = TaskInfo(task_id=1, initial_classes=3, increment=1, num_classes=4,
                    n_tasks=2)
    ctx = ModelContext(net, task, None)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=v["params"],
        batch_stats=v["batch_stats"], opt_state=None,
        rng=jax.random.PRNGKey(2),
        prototypes=jnp.ones((2, 32)) * 0.2, proto_counts=jnp.ones((2,)),
    )
    batch = {
        "image": jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3),
                             jnp.float32),
        "label": jnp.asarray(
            np.random.RandomState(1).randint(0, 4, (2, 16, 16)), jnp.int32),
    }
    conf2 = jnp.zeros((2, 2), jnp.int32)
    conf2, stats = aux_bg_step(ctx, state, batch, conf2)
    assert int(np.asarray(conf2).sum()) == 2 * 16 * 16
    assert "bg_prob_mean" in stats and "old_cl_prob_mean" in stats
    # OOD pass over two batches
    metrics = ood_test(ctx, state, iter([batch, batch]))
    assert 0.0 <= metrics["Accuracy_current"] <= 1.0
    assert 0.0 <= metrics["F1_score_current"] <= 1.0
