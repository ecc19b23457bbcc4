"""Round-trip tests for the serving wire-format bit-packer (ops/bitpack.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bacs_tpu.ops.bitpack import bits_needed, pack_bits, unpack_bits


@pytest.mark.parametrize(
    "n_cls,bits", [(2, 1), (6, 3), (16, 4), (21, 5), (150, 8), (256, 8)]
)
def test_roundtrip_and_payload_size(n_cls, bits):
    assert bits_needed(n_cls) == bits
    rs = np.random.RandomState(n_cls)
    preds = rs.randint(0, n_cls, (2, 24, 16)).astype(np.uint8)
    packed = np.asarray(pack_bits(jnp.asarray(preds), bits))
    assert packed.shape == (2, 24 * 16 * bits // 8)
    np.testing.assert_array_equal(
        unpack_bits(packed, preds.shape, bits), preds
    )


def test_rejects_bad_shapes_and_widths():
    with pytest.raises(ValueError):
        pack_bits(jnp.zeros((1, 3, 3), jnp.uint8), 5)  # H*W % 8 != 0
    with pytest.raises(ValueError):
        pack_bits(jnp.zeros((1, 4, 4), jnp.uint8), 9)
    with pytest.raises(ValueError):
        bits_needed(1)
