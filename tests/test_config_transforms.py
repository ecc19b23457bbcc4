"""Config loader (hydra-compat) and device transform tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bacs_tpu.config import load_config
from bacs_tpu.data import transforms


def test_load_config_defaults_and_overrides():
    cfg = load_config("conf/continual_debug", "config", [])
    assert cfg.loss._target_ == "loss.CrossEntropy"
    assert cfg.training.initial_increment == 3
    assert cfg.dataset.dataset.num_classes == 6


def test_override_grammar():
    cfg = load_config(
        "conf/continual_debug",
        "config",
        [
            "loss=mib",  # group swap
            "training.batch_size=8",  # dotted set
            "+training.steps_per_class=50",  # add
            "training.mode=disjoint",
        ],
    )
    assert cfg.loss._target_ == "loss.MiB"
    assert cfg.training.batch_size == 8
    assert cfg.training.steps_per_class == 50
    assert cfg.training.mode == "disjoint"


def test_override_unknown_key_rejected():
    with pytest.raises(KeyError):
        load_config("conf/continual_debug", "config", ["training.nope=1"])


def test_train_transform_shapes_and_remap():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 48, 48, 3)).astype(np.uint8)
    lbls = np.full((2, 48, 48), 3, np.uint8)
    lbls[:, :10] = 255
    table = np.zeros(256, np.int32)
    table[3] = 1  # remap class 3 → 1
    table[255] = 255
    out = transforms.train_transform(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(lbls),
        jnp.asarray(table), crop=32,
    )
    assert out["image"].shape == (2, 32, 32, 3)
    assert out["label"].shape == (2, 32, 32)
    u = np.unique(np.asarray(out["label"]))
    assert set(u.tolist()) <= {1, 255}


def test_eval_transform_is_deterministic():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8)
    lbls = rng.randint(0, 4, (1, 32, 32)).astype(np.uint8)
    table = np.arange(256, dtype=np.int32)
    a = transforms.eval_transform(jnp.asarray(imgs), jnp.asarray(lbls),
                                  jnp.asarray(table), crop=32)
    b = transforms.eval_transform(jnp.asarray(imgs), jnp.asarray(lbls),
                                  jnp.asarray(table), crop=32)
    np.testing.assert_array_equal(np.asarray(a["label"]), np.asarray(b["label"]))
    np.testing.assert_allclose(np.asarray(a["image"]), np.asarray(b["image"]))


def test_replay_augment_varies_per_key_and_preserves_shape():
    """Buffered canonical crops are re-augmented per replay step
    (reference: base_datamodule.py:433-451)."""
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    lbls = jnp.asarray(rng.randint(0, 4, (2, 32, 32)).astype(np.int32))
    ia, la = transforms.replay_augment(jax.random.PRNGKey(0), imgs, lbls)
    ib, lb = transforms.replay_augment(jax.random.PRNGKey(1), imgs, lbls)
    assert ia.shape == imgs.shape and la.shape == lbls.shape
    assert la.dtype == lbls.dtype
    assert np.abs(np.asarray(ia) - np.asarray(ib)).max() > 1e-3  # differs per key
    # labels stay within the original value set (nearest interpolation)
    assert set(np.unique(np.asarray(la)).tolist()) <= set(
        np.unique(np.asarray(lbls)).tolist()
    )


def test_eval_batches_report_real_sample_count():
    """Padded eval tail batches carry n_real so losses can be sample-weighted
    (reference: PL batch-size-weighted epoch means)."""
    from bacs_tpu.config.core import load_config
    from bacs_tpu.data import create_datamodule

    # synthetic: 8 val samples, batch 4 → override batch to 3: 3+3+2 (pad 1)
    cfg = load_config("conf/continual_debug", "config", ["training.batch_size=3"])
    dm = create_datamodule(cfg)
    dm.set_task_id(0)
    batches = list(dm.eval_batches(0))
    n_reals = [b["n_real"] for b in batches]
    assert all(b["image"].shape[0] == 3 for b in batches)
    assert n_reals[-1] < 3 or len(set(n_reals)) == 1
    assert sum(n_reals) == len(dm.val_indices(0)) if hasattr(dm, "val_indices") \
        else sum(n_reals) > 0
    # padded rows are fully ignored
    last = batches[-1]
    if last["n_real"] < 3:
        lbl = np.asarray(last["label"])
        assert (lbl[last["n_real"]:] == 255).all()


def test_normalize_denormalize_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (4, 4, 3)).astype(np.uint8)
    x = transforms.normalize_image(jnp.asarray(img))
    back = transforms.denormalize_image(x)
    np.testing.assert_allclose(np.asarray(back), img, atol=1)


def test_prefetch_relays_worker_exceptions():
    """A decode failure in the prefetch thread must raise at the consumer,
    not silently truncate the epoch (data/datamodule.py _prefetch)."""
    import pytest

    from bacs_tpu.data.datamodule import _prefetch

    def gen():
        yield 1
        raise RuntimeError("decode failed")

    it = _prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetch_worker_exits_when_consumer_abandons():
    """Breaking out of an epoch early must release the prefetch worker
    (no thread parked forever on a full queue holding decoded batches)."""
    import threading
    import time

    from bacs_tpu.data.datamodule import _prefetch

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = _prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()  # consumer abandons mid-epoch
    for _ in range(50):  # worker polls stop at 0.1 s
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before, "prefetch worker leaked"
    assert len(produced) < 100, "worker ran the whole epoch after abandon"
