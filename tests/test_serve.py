"""Predictor / serving path: checkpoint → predict → export roundtrip."""

import os
import tempfile

import numpy as np

from bacs_tpu.config.core import Config
from bacs_tpu.train.loop import Trainer


def test_predict_from_checkpoint_and_export():
    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "ckpt")
        cfg = Config._wrap(
            {
                "dataset": {
                    "_target_": "dataloaders.SyntheticDataModule",
                    "dataset": {"num_classes": 4, "crop_size": 16,
                                 "n_train": 8, "n_val": 4},
                },
                "network": {"_target_": "networks.UNet", "num_layers": 3},
                "optimizer": {"_target_": "torch.optim.SGD", "lr": 0.05,
                               "momentum": 0.9},
                "scheduler": {"_target_": "training.PolyLR"},
                "training": {"name": "t", "batch_size": 2, "epochs": 1,
                              "seed": 1, "debug": True, "ckpt_dir": ckpt},
                "loss": {"_target_": "loss.CrossEntropy"},
            }
        )
        Trainer(cfg).fit()

        from bacs_tpu.serve import Predictor

        predictor = Predictor.from_checkpoint(ckpt, cfg)
        imgs = np.random.RandomState(0).randint(
            0, 255, (2, 16, 16, 3)
        ).astype(np.uint8)
        preds, conf = predictor.predict(imgs)
        assert preds.shape == (2, 16, 16)
        assert preds.max() < 4
        assert 0.0 <= float(conf.mean()) <= 1.0

        # file-based prediction with PNG mask output
        from PIL import Image

        img_path = os.path.join(d, "x.png")
        Image.fromarray(imgs[0]).save(img_path)
        out_dir = os.path.join(d, "masks")
        masks = predictor.predict_files([img_path], out_dir=out_dir)
        assert len(masks) == 1
        assert os.path.exists(os.path.join(out_dir, "x_mask.png"))

        # uint8-quantized confidence payload (serving is device→host
        # bandwidth-bound; this halves the conf bytes): same masks,
        # confidence within one quantization step of the f16 path
        q = Predictor(
            dict(cfg.get("network", {})), predictor.num_classes,
            predictor.variables["params"],
            predictor.variables["batch_stats"],
            crop_size=predictor.crop_size,
            active_classes=predictor.active_classes,
            conf_dtype="uint8",
        )
        preds_q, conf_q = q.predict(imgs)
        np.testing.assert_array_equal(preds_q, preds)
        assert conf_q.dtype == np.uint8
        np.testing.assert_allclose(
            conf_q.astype(np.float32) / 255.0,
            conf.astype(np.float32),
            atol=1.0 / 255.0 + 1e-3,
        )

        # minimal wire format: bit-packed masks (ceil(log2(n)) bits/px,
        # unpacked transparently in predict) + no confidence payload
        pk = Predictor(
            dict(cfg.get("network", {})), predictor.num_classes,
            predictor.variables["params"],
            predictor.variables["batch_stats"],
            crop_size=predictor.crop_size,
            active_classes=predictor.active_classes,
            conf_dtype="none",
            pack_masks=True,
        )
        preds_p, conf_p = pk.predict(imgs)
        assert conf_p is None
        np.testing.assert_array_equal(preds_p, preds)

        # pipelined streaming over several batches == per-batch predict,
        # for both the packed and the default wire format
        rs = np.random.RandomState(7)
        stream = [
            rs.randint(0, 256, imgs.shape).astype(np.uint8)
            for _ in range(3)
        ]
        for p in (predictor, pk):
            singles = [p.predict(b) for b in stream]
            for (mp, cp), (ms, cs) in zip(p.predict_many(stream), singles):
                np.testing.assert_array_equal(mp, ms)
                if cs is None:
                    assert cp is None
                else:
                    np.testing.assert_array_equal(cp, cs)

        # multi-chip serving: batch sharded over the virtual 8-device
        # mesh must match the single-device forward exactly
        mp = Predictor(
            dict(cfg.get("network", {})), predictor.num_classes,
            predictor.variables["params"],
            predictor.variables["batch_stats"],
            crop_size=predictor.crop_size,
            active_classes=predictor.active_classes,
            n_devices=8,
        )
        assert mp.n_devices == 8
        imgs8 = np.repeat(imgs, 4, axis=0)  # batch 8, divisible by mesh
        preds8, conf8 = mp.predict(imgs8)
        preds1, conf1 = predictor.predict(imgs8)
        np.testing.assert_array_equal(preds8, preds1)
        np.testing.assert_array_equal(conf8, conf1)

        # requesting more devices than exist downgrades loudly
        import warnings as _warnings
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            Predictor(
                dict(cfg.get("network", {})), predictor.num_classes,
                predictor.variables["params"],
                predictor.variables["batch_stats"],
                crop_size=predictor.crop_size,
                active_classes=predictor.active_classes,
                n_devices=64,
            )
        assert any("64" in str(w.message) for w in caught)

        # non-divisible batches fail loudly on a serving mesh
        import pytest as _pytest
        with _pytest.raises(ValueError, match="not divisible"):
            mp.predict(imgs[:1])

        # exporting a MESH predictor emits a portable single-device
        # artifact (a mesh-exported fn can only run on that device count)
        mesh_export = os.path.join(d, "mesh_model.stablehlo")
        mp.export(mesh_export, batch_size=2)
        out_m = Predictor.run_exported(mesh_export, mp.variables, imgs)
        np.testing.assert_array_equal(np.asarray(out_m[0]), preds)

        # jax.export roundtrip
        export_path = os.path.join(d, "model.stablehlo")
        predictor.export(export_path, batch_size=2)
        preds2, _ = Predictor.run_exported(
            export_path, predictor.variables, imgs
        )
        np.testing.assert_array_equal(np.asarray(preds2), preds)

        # exporting the lean wire format: consumers get the packed
        # bytes; ops/bitpack.unpack_bits recovers the masks
        from bacs_tpu.ops.bitpack import unpack_bits
        packed_path = os.path.join(d, "model_packed.stablehlo")
        pk.export(packed_path, batch_size=2)
        packed_out = Predictor.run_exported(packed_path, pk.variables, imgs)
        np.testing.assert_array_equal(
            unpack_bits(np.asarray(packed_out), imgs.shape[:3], pk.mask_bits),
            preds,
        )


def test_transeg_predictor():
    """The serving surface covers the transformer family too (the
    checkpoint round-trip above uses UNet; the fused argmax tail works
    from any pre-upsample sem_logits resolution)."""
    import jax
    import jax.numpy as jnp

    from bacs_tpu.models import create_network
    from bacs_tpu.serve import Predictor

    tr = {"hidden_dim": 32, "nhead": 2, "num_decoder_layers": 1,
          "dim_feedforward": 64}
    cfg = {"_target_": "networks.TranSeg", "norm": "abn",
           "backbone": "resnet18", "transformer": tr}
    net = create_network("transeg", num_classes=5, norm="abn",
                         axis_name=None, crop_size=32, backbone="resnet18",
                         transformer=tr)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, train=False,
    )
    p = Predictor(cfg, 5, v["params"], v["batch_stats"], crop_size=32)
    preds, conf = p.predict(np.zeros((2, 32, 32, 3), np.uint8))
    assert preds.shape == (2, 32, 32) and preds.dtype == np.uint8
    assert conf.shape == (2, 32, 32) and conf.dtype == np.float16
