"""Residual block golden tests.

Golden parameter counts below were measured from the reference blocks
(residual_block.py) at channels=16, input 8x8, for every
(downsample, preact, use_proj) combination."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.models.blocks import (
    BottleneckResidualBlock,
    ResidualBlock,
)

# (cls, downsample, preact, use_proj) -> reference param count
BLOCK_GOLDENS = {
    ("basic", False, False, False): 4672,
    ("basic", False, False, True): 4672,
    ("basic", False, True, False): 4672,
    ("basic", False, True, True): 4672,
    ("basic", True, False, False): 13952,
    ("basic", True, False, True): 14464,
    ("basic", True, True, False): 13920,
    ("basic", True, True, True): 14432,
    ("bottleneck", False, False, False): 320,
    ("bottleneck", False, False, True): 320,
    ("bottleneck", False, True, False): 320,
    ("bottleneck", False, True, True): 320,
    ("bottleneck", True, False, False): 1056,
    ("bottleneck", True, False, True): 1568,
    ("bottleneck", True, True, False): 1024,
    ("bottleneck", True, True, True): 1536,
}

CLASSES = {"basic": ResidualBlock, "bottleneck": BottleneckResidualBlock}


def _count(params):
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


@pytest.mark.parametrize("tag,ds,preact,proj", list(
    (t, d, p, j)
    for t in ("basic", "bottleneck")
    for d in (False, True)
    for p in (False, True)
    for j in (False, True)
))
def test_block_golden_params_and_shapes(tag, ds, preact, proj):
    block = CLASSES[tag](channels=16, downsample=ds, preact=preact,
                         use_proj=proj, dropout_prob=0.0,
                         compute_dtype=jnp.float32)
    params, state, out_shape = block.init(jax.random.key(0), (8, 8, 16))
    assert _count(params) == BLOCK_GOLDENS[(tag, ds, preact, proj)]
    expected = (4, 4, 32) if ds else (8, 8, 16)
    assert out_shape == expected
    x = jnp.ones((2, 8, 8, 16), jnp.float32)
    y, new_state = block.apply(params, state, x, train=True, rng=jax.random.key(1))
    assert y.shape == (2,) + expected


def test_option_a_shortcut_semantics():
    """use_proj=False downsample: shortcut = stride-2 subsample + zero pad of
    in_channels new channels at the END of the channel dim
    (residual_block.py:89-94)."""
    block = ResidualBlock(channels=4, downsample=True, preact=True,
                          use_proj=False, dropout_prob=0.0,
                          compute_dtype=jnp.float32)
    params, state, _ = block.init(jax.random.key(0), (4, 4, 4))
    # Zero out the residual path so only the shortcut reaches the output.
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    x = np.arange(2 * 4 * 4 * 4, dtype=np.float32).reshape(2, 4, 4, 4)
    y, _ = block.apply(params, state, jnp.asarray(x), train=False)
    # BN with zero scale passes zero; conv with zero weights passes zero.
    expected_first4 = x[:, ::2, ::2, :]
    np.testing.assert_allclose(np.asarray(y[..., :4]), expected_first4)
    np.testing.assert_allclose(np.asarray(y[..., 4:]), 0.0)


def test_projection_shortcut_applies_conv_after_subsample():
    block = ResidualBlock(channels=4, downsample=True, preact=True,
                          use_proj=True, dropout_prob=0.0,
                          compute_dtype=jnp.float32)
    params, state, _ = block.init(jax.random.key(0), (4, 4, 4))
    # Kill the residual path, make the projection identity-like.
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    proj_w = np.zeros((1, 1, 4, 8), np.float32)
    for c in range(4):
        proj_w[0, 0, c, c] = 1.0
    params["proj"]["w"] = jnp.asarray(proj_w)
    x = np.arange(2 * 4 * 4 * 4, dtype=np.float32).reshape(2, 4, 4, 4)
    y, _ = block.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y[..., :4]), x[:, ::2, ::2, :])
    np.testing.assert_allclose(np.asarray(y[..., 4:]), 0.0)


def test_postact_applies_final_relu():
    """v1 blocks ReLU the sum; v2 blocks do not (residual_block.py:96-99)."""
    for preact, can_be_negative in [(True, True), (False, False)]:
        block = ResidualBlock(channels=4, downsample=False, preact=preact,
                              use_proj=False, dropout_prob=0.0,
                              compute_dtype=jnp.float32)
        params, state, _ = block.init(jax.random.key(2), (4, 4, 4))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4, 4, 4)),
                        jnp.float32)
        y, _ = block.apply(params, state, x, train=False)
        if can_be_negative:
            assert np.asarray(y).min() < 0
        else:
            assert np.asarray(y).min() >= 0


def test_dropout_active_only_in_train():
    block = ResidualBlock(channels=8, downsample=False, preact=True,
                          use_proj=False, dropout_prob=0.5,
                          compute_dtype=jnp.float32)
    params, state, _ = block.init(jax.random.key(0), (8, 8, 8))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 8, 8, 8)),
                    jnp.float32)
    y_eval1, _ = block.apply(params, state, x, train=False)
    y_eval2, _ = block.apply(params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval1), np.asarray(y_eval2))
    y_tr1, _ = block.apply(params, state, x, train=True, rng=jax.random.key(1))
    y_tr2, _ = block.apply(params, state, x, train=True, rng=jax.random.key(2))
    assert not np.array_equal(np.asarray(y_tr1), np.asarray(y_tr2))


def test_batchnorm_state_updates_in_train_only():
    block = ResidualBlock(channels=4, downsample=False, preact=True,
                          use_proj=False, dropout_prob=0.0,
                          compute_dtype=jnp.float32)
    params, state, _ = block.init(jax.random.key(0), (4, 4, 4))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(16, 4, 4, 4)),
                    jnp.float32)
    _, state_eval = block.apply(params, state, x, train=False)
    assert int(state_eval["norm1"]["count"]) == 0
    _, state_tr = block.apply(params, state, x, train=True, rng=jax.random.key(0))
    assert int(state_tr["norm1"]["count"]) == 1
    assert not np.allclose(np.asarray(state_tr["norm1"]["mean"]), 0.0)


def test_dropout_quantized_keep_is_unbiased():
    """uint8-bits dropout: mean preserved exactly under the quantized keep
    probability, and the empirical keep rate matches round(keep*256)/256."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch_ddp_resnet_tpu.models.layers import Dropout

    d = Dropout(rate=0.3)
    x = jnp.ones((64, 16, 16, 32), jnp.float32)
    y, _ = d.apply({}, {}, x, train=True, rng=jax.random.key(0))
    y = np.asarray(y)
    keep_q = round(0.7 * 256) / 256
    kept = (y > 0).mean()
    assert abs(kept - keep_q) < 0.01, (kept, keep_q)
    # inverted scaling uses the quantized keep -> exact unbiasedness
    np.testing.assert_allclose(y[y > 0], 1.0 / keep_q, rtol=1e-6)
    np.testing.assert_allclose(y.mean(), 1.0, atol=0.01)
    # eval mode: identity
    y2, _ = d.apply({}, {}, x, train=False, rng=None)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(x))
